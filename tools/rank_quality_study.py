"""Trained-quality study of the low-rank final conditioner (STATUS r5 item).

The r4 speed result is proven: ``final_rank=4`` lifts the flagship 10-D
fused-sampler device rate 1.38e8 -> 2.17e8 samples/s (bench.py, exactness-
gated).  What speed can't answer is the EXPRESSIVITY cost: a rank-r final
layer constrains each coupling cell's bin-logit map to an r-dimensional
subspace of the full (hidden x out) map, so trained quality is per-target.

This tool trains the SAME target with final_rank in {None, 4, 2, 1} across
seeds and reports median/IQR unweighting efficiency (w_mean/w_max, the
reference's protocol — nisrep/utils/experiment_mg.py:66-76,101) and ESS
fraction on fresh samples from the best model.

Targets:
  camel10  flagship-shaped: 10-D two-mode camel, PWQuad(8, 8, [16,16])
           (the bench.py flagship architecture — the config whose kernel
           rate the rank variant accelerates)
  dy       Drell-Yan 2->2 tau-convolved ToyPDF, PWQuad(4, 16, [16]*2)
           (the head-to-head physics config, tools/measure_nf_tpu.py)

Run from /root/repo:  python - --target camel10 --seeds 3 < tools/rank_quality_study.py
Writes /tmp/rank_quality_<target>.json and prints a markdown table.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if jax.default_backend() not in ("tpu",):
    # pin local CPU (the ambient sitecustomize may prefer the remote TPU
    # plugin programmatically; config update beats it — see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from nf_tpu import PWQuadManager, FlatInvertiblePhasespace  # noqa: E402
from nf_tpu.phasespace import lorentz  # noqa: E402
from nf_tpu.phasespace.pdf import ToyPDF  # noqa: E402
from nf_tpu.training import optimizers  # noqa: E402


def quality(NF, f, n=200_000, key=None):
    x, jac = NF.sample(n, key=key or jax.random.PRNGKey(17))
    wt = f(x) * jac
    eff = float(jnp.mean(wt) / jnp.max(wt))
    ess = float(jnp.mean(wt) ** 2 / jnp.mean(wt ** 2))
    return eff, ess


def make_camel10():
    # width calibration matters in 10-D: at s=0.1 each mode carries ~3e-8
    # of the unit-cube mass, so a 20k uniform batch has ~0 informative
    # samples and EVERY variant trains to eff ~ 0 (verified) — a target-
    # visibility failure, not an expressivity measurement.  s=0.2 puts
    # the per-mode mass at ~3e-5 (uniform ESS ~ 0.2%, ~40 informative
    # samples per 20k batch): hard enough to separate variants, visible
    # enough to train from scratch.
    c1, c2, s2 = 0.3, 0.7, 0.2 ** 2

    def camel10(x):
        d1 = jnp.sum((x - c1) ** 2, axis=1)
        d2 = jnp.sum((x - c2) ** 2, axis=1)
        return jnp.exp(-d1 / s2) + jnp.exp(-d2 / s2)

    # kl loss + ess selection: the variance loss barely moves off uniform
    # here (trained ESS 0.36% vs uniform 0.2%, measured), while the
    # reweighted-KL extension trains narrow multi-mode targets reliably
    # (STATUS.md r3 item 12) — rank comparisons need a baseline that
    # actually learns.
    return 10, camel10, dict(create=(8, 8, [16, 16]), batch=1 << 16,
                             epochs=300, preburn=30,
                             train_kwargs=dict(loss_mode="kl",
                                               kill_counter=50))


def make_dy():
    E_COLLIDER = 2000.0
    MZ2, GZ = 91.188 ** 2, 2.4952
    gen = FlatInvertiblePhasespace([0.0, 0.0], [0.0, 0.0], pdf=ToyPDF(),
                                   pdf_active=True, tau=True)

    def integrand(w):
        momenta, wgt = gen.generateKinematics_batch(
            E_COLLIDER, w, pT_mincut=10.0, rap_maxcut=2.4, pdgs=(2, -2))
        shat = lorentz.square(momenta[:, 0, :] + momenta[:, 1, :])
        return 1e4 / ((shat - MZ2) ** 2 + MZ2 * GZ ** 2) * wgt

    return gen.nDimPhaseSpace() + 2, integrand, dict(
        create=(4, 16, [16, 16]), batch=10000, epochs=300, preburn=20)


def make_dy_mapped():
    """BW-mapped DY (tools/mapped_dy_demo.py): the analytic map removes the
    resonance so the flow actually learns the smooth remainder (TPU record
    29.5% ESS) — the discriminating target for rank expressivity, since the
    raw-DY plateau (~1e-4 eff for every variant) masks any rank effect.
    CPU-sized batch (65k vs the demo's 262k)."""
    from nf_tpu.phasespace.mappings import remap_integrand, drell_yan_tau_map

    n_flow, integrand, _ = make_dy()
    mapped = remap_integrand(integrand, n_flow - 2,
                             drell_yan_tau_map(91.188, 2.4952, 2000.0))
    return n_flow, mapped, dict(create=(4, 32, [32, 32]), batch=1 << 15,
                                epochs=200, preburn=30,
                                train_kwargs=dict(loss_mode="kl",
                                                  kill_counter=50))


def make_zz2to4():
    """The 2->4 double-resonance through the BW-mapped decay-tree channel
    (tools/run_2to4.py item 1) at CPU scale — the 10-D flagship-shaped
    physics target, with the flow identity-initialized on the mapped
    channel's remainder."""
    from functools import partial

    from nf_tpu.phasespace.mappings import (remap_integrand,
                                            shifted_power_unit_map)
    from nf_tpu.phasespace.topology import (BreitWignerSMap,
                                            ResonanceDecayPhasespace)

    E_COLLIDER, MZ, GZ = 2000.0, 91.188, 2.4952
    MZ2, GAM2 = MZ ** 2, (MZ * GZ) ** 2
    topo = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)},
        pdf=ToyPDF(), pdf_active=True, tau=True)
    tau_th = (2 * MZ / E_COLLIDER) ** 2

    def base(w):
        momenta, wgt = topo.generateKinematics_batch(
            E_COLLIDER, w, pT_mincut=20.0, delR_mincut=0.4, rap_maxcut=2.4,
            pdgs=(2, -2))
        fin = momenta[:, 2:, :]
        s34 = lorentz.square(fin[:, 0] + fin[:, 1])
        s56 = lorentz.square(fin[:, 2] + fin[:, 3])
        bw34 = 1e4 / ((s34 - MZ2) ** 2 + GAM2)
        bw56 = 1e4 / ((s56 - MZ2) ** 2 + GAM2)
        return bw34 * bw56 * wgt

    mapped = remap_integrand(
        base, topo.nDimPhaseSpace(),
        partial(shifted_power_unit_map, exponent=-3.0, shift=3 * tau_th))
    return topo.nDimPhaseSpace() + 2, mapped, dict(
        create=(4, 32, [32, 32]), batch=1 << 15, epochs=150, preburn=0,
        create_kwargs=dict(identity_init=True),
        train_kwargs=dict(loss_mode="kl", kill_counter=50))


TARGETS = {"camel10": make_camel10, "dy": make_dy,
           "dy_mapped": make_dy_mapped, "zz2to4": make_zz2to4}


def run_one(n_flow, f, cfg, rank, seed):
    NF = PWQuadManager(n_flow=n_flow, seed=seed)
    c_cells, c_bins, c_nn = cfg["create"]
    NF.create_model(c_cells, c_bins, c_nn, final_rank=rank,
                    **cfg.get("create_kwargs", {}))
    t0 = time.time()
    NF._train_variance_forward_seq(
        f, optimizers.adamax(2e-3, 1e-4), log=False,
        batch_size=cfg["batch"], epochs=cfg["epochs"],
        pretty_progressbar=False, mini_batch_size=cfg["batch"],
        integrate=False, preburn_time=cfg["preburn"],
        select_best_by="ess", **cfg.get("train_kwargs", {}))
    dt = time.time() - t0
    eff, ess = quality(NF, f)
    return {"rank": rank, "seed": seed, "eff": eff, "ess": ess,
            "train_seconds": dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="camel10", choices=sorted(TARGETS))
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--ranks", default="none,4,2,1")
    args = ap.parse_args()

    ranks = [None if r == "none" else int(r)
             for r in args.ranks.split(",")]
    n_flow, f, cfg = TARGETS[args.target]()

    rows = []
    for rank in ranks:
        for seed in range(args.seeds):
            r = run_one(n_flow, f, cfg, rank, seed)
            rows.append(r)
            print(f"# rank={rank} seed={seed}: eff={r['eff']:.4f} "
                  f"ess={r['ess']:.4f} ({r['train_seconds']:.0f}s)",
                  flush=True)

    out = {"target": args.target, "config": cfg["create"],
           "batch": cfg["batch"], "epochs": cfg["epochs"],
           "backend": jax.default_backend(), "rows": rows, "summary": {}}
    print(f"\n| final_rank | median eff | eff range | median ESS |")
    print(f"|---|---|---|---|")
    for rank in ranks:
        effs = sorted(r["eff"] for r in rows if r["rank"] == rank)
        esss = sorted(r["ess"] for r in rows if r["rank"] == rank)
        med_e, med_s = float(np.median(effs)), float(np.median(esss))
        out["summary"][str(rank)] = {
            "median_eff": med_e, "min_eff": effs[0], "max_eff": effs[-1],
            "median_ess": med_s}
        print(f"| {rank} | {med_e:.4f} | [{effs[0]:.4f}, {effs[-1]:.4f}] "
              f"| {med_s:.4f} |")

    path = f"/tmp/rank_quality_{args.target}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\n# wrote {path}")


if __name__ == "__main__":  # `python - < file` also sets __main__
    main()
