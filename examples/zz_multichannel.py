"""Multi-channel phase space + flow: overlapping resonance pairings.

The hard case for single-channel importance sampling: a same-flavor
four-lepton final state where the matrix element carries resonances in
COMPETING pairings of the leptons — here a Z in the (01)(23) pairing and
a heavier Z' in the (03)(12) pairing.  No single decay-tree channel can
flatten both.  The multi-channel machinery (nf_tpu.phasespace.topology,
an nf_tpu extension; the reference has flat RAMBO only —
reference nisrep/PhaseSpace/flat_phase_space_generator.py) handles it:

  1. one ResonanceDecayPhasespace channel per pairing, each with exact
     Breit-Wigner importance maps on its pair masses;
  2. the alpha-weighted multi-channel combination (exactly unbiased for
     any fixed alphas);
  3. Kleiss-Pittau iteration to the variance-minimizing alphas;
  4. an identity-initialized flow (+ low-rank conditioner, the validated
     rank-4 production variant) trained on the smooth remainder.

Run: python examples/zz_multichannel.py    (CPU demo scale; on TPU raise
BATCH/EPOCHS — the same script is the production workflow.)
"""

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import time

import jax
import jax.numpy as jnp

from nf_tpu import PWQuadManager
from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.phasespace.topology import (BreitWignerSMap,
                                        ResonanceDecayPhasespace,
                                        multichannel_integrand,
                                        optimize_alphas)
from nf_tpu.training import optimizers

E_COLLIDER = 2000.0
MZ, GZ = 91.188, 2.4952
MZP, GZP = 250.0, 12.0
CUTS = dict(pT_mincut=20.0, delR_mincut=0.4, rap_maxcut=2.4, pdgs=(2, -2))
# demo scale; TPU: NF_TPU_ZZ_BATCH=1048576 NF_TPU_ZZ_EPOCHS=300
BATCH = int(_os.environ.get("NF_TPU_ZZ_BATCH", 1 << 14))
EPOCHS = int(_os.environ.get("NF_TPU_ZZ_EPOCHS", 80))


def bw(s, m, g):
    return 1e4 / ((s - m * m) ** 2 + (m * g) ** 2)


def matrix_element(momenta):
    """|M|^2 toy: Z resonances in the (01)(23) pairing plus a Z' pair in
    (03)(12) — two incompatible channel structures in one integrand."""
    f = momenta[:, 2:, :]
    s01 = lorentz.square(f[:, 0] + f[:, 1])
    s23 = lorentz.square(f[:, 2] + f[:, 3])
    s03 = lorentz.square(f[:, 0] + f[:, 3])
    s12 = lorentz.square(f[:, 1] + f[:, 2])
    # the 5e3 coupling puts the Z' term at ~30% of the cross-section
    # (the Z' sits where the ToyPDF flux is falling fast), so BOTH
    # channels genuinely matter
    return (bw(s01, MZ, GZ) * bw(s23, MZ, GZ)
            + 5e3 * bw(s03, MZP, GZP) * bw(s12, MZP, GZP))


def ess_of(f, n, n_flow, key):
    w = f(jax.random.uniform(key, (n, n_flow)))
    return float(jnp.mean(w) ** 2 / jnp.mean(w ** 2))


def main():
    common = dict(pdf=ToyPDF(), pdf_active=True, tau=True)
    ch_z = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)}, **common)
    ch_zp = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 3), (1, 2)),
        mass_maps={(0, 3): BreitWignerSMap(MZP, GZP),
                   (1, 2): BreitWignerSMap(MZP, GZP)}, **common)
    channels = [ch_z, ch_zp]
    n_flow = 1 + ch_z.nDimPhaseSpace() + 2   # selector + PS + (tau, y)
    key = jax.random.PRNGKey(0)

    # single-channel baselines: each channel flattens ITS pairing only
    for tag, chs, al in (("Z-pairing only", [ch_z], [1.0]),
                         ("Z'-pairing only", [ch_zp], [1.0])):
        g1 = multichannel_integrand(matrix_element, chs, al, E_COLLIDER,
                                    **CUTS)
        print(f"uniform ESS [{tag}]: "
              f"{ess_of(g1, 1 << 17, n_flow, key):.4%}", flush=True)

    # 3. Kleiss-Pittau alphas (unbiased at every iterate)
    alphas, hist = optimize_alphas(matrix_element, channels, [0.5, 0.5],
                                   E_COLLIDER, jax.random.PRNGKey(1),
                                   n_iter=4, n_samples=1 << 15, **CUTS)
    print(f"Kleiss-Pittau alphas: {alphas.round(4)}  "
          f"(variance {hist[0]['variance']:.3e} -> "
          f"{hist[-1]['variance']:.3e})", flush=True)

    g = multichannel_integrand(matrix_element, channels, alphas,
                               E_COLLIDER, **CUTS)
    ess_u = ess_of(g, 1 << 17, n_flow, key)
    print(f"uniform ESS [2-channel, optimized alphas]: {ess_u:.4%}",
          flush=True)

    # 4. identity-init rank-4 flow on the multi-channel remainder
    NF = PWQuadManager(n_flow=n_flow, seed=0)
    NF.create_model(4, 16, [32] * 2, identity_init=True, final_rank=4)
    t0 = time.time()
    NF._train_variance_forward_seq(
        g, optimizers.adamax(2e-3, 1e-4), log=False, batch_size=BATCH,
        epochs=EPOCHS, mini_batch_size=BATCH, pretty_progressbar=False,
        integrate=False, preburn_time=0, kill_counter=50, loss_mode="kl",
        select_best_by="ess")
    x_s, jac_s = NF.sample(1 << 17, key=jax.random.PRNGKey(5))
    wf = g(x_s) * jac_s
    ess = float(jnp.mean(wf) ** 2 / jnp.mean(wf ** 2))
    sig, err = NF.integrate(g, 8, 1 << 17, seed=11, combine="mean")
    print(f"flow x 2-channel: train {time.time() - t0:.0f}s  "
          f"ESS {ess:.4%} ({ess / max(ess_u, 1e-12):.2f}x uniform)  "
          f"integral {sig:.4e} +/- {err:.1e}", flush=True)

    # 5. LEARNED multi-channel (nf_tpu r4 extension, MadNIS-style): one
    # flow PER channel + on-device Kleiss-Pittau alphas.  The shared flow
    # above sees the same latent columns meaning different things per
    # channel; per-channel flows specialize, and the mixture density is
    # fully learned (training/multichannel.py).
    from nf_tpu.training import multichannel as mcl

    flows, ps, ss = mcl.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 16, [32] * 2, final_rank=4)
    t0 = time.time()
    # loss_mode="kl" is the measured winner here (28.9% best ESS vs ~2%
    # for var/secmom which plateau regardless of lr — the sweep is
    # tools/tune_multichannel.py); lr 5e-3 from the same sweep.
    out = mcl.train_multichannel(
        channels, flows, ps, ss, matrix_element, E_COLLIDER,
        optimizers.adamax(5e-3, 1e-4), jax.random.PRNGKey(3),
        alphas=list(alphas), batch_per_channel=BATCH // 2, epochs=EPOCHS,
        loss_mode="kl",
        mini_batch_per_channel=min(BATCH // 2, 1 << 16),
        epochs_per_call=EPOCHS // 12 if EPOCHS % 12 == 0 else None,
        **CUTS)
    w_mc, _ = jax.jit(lambda p, a: mcl.multichannel_sample(
        channels, flows, p, ss, matrix_element, E_COLLIDER,
        jax.random.PRNGKey(5), 1 << 16, a, **CUTS))(
            out["best_params"], jnp.asarray(out["best_alphas"]))
    sig_mc, err_mc, ess_mc = mcl.combine_stratified(
        w_mc, jnp.asarray(out["best_alphas"]))
    print(f"per-channel flows: train {time.time() - t0:.0f}s  "
          f"ESS {float(ess_mc):.4%} "
          f"({float(ess_mc) / max(ess_u, 1e-12):.2f}x uniform)  "
          f"alphas {out['best_alphas'].round(3)}  "
          f"integral {float(sig_mc):.4e} +/- {float(err_mc):.1e}",
          flush=True)

    # 6. unweighted events from the learned mixture; per_channel_max
    # allocates proposals ~ alpha_k * w_max_k and unweights each channel
    # against its own maximum (exactly f-distributed either way; up to
    # C x better efficiency when one channel's tail sets the global max)
    for tag, pc in (("global-max", False), ("per-channel-max", True)):
        events, xbs, eff, n_over = mcl.multichannel_unweight(
            channels, flows, out["best_params"], ss, matrix_element,
            E_COLLIDER, jax.random.PRNGKey(7), out["best_alphas"],
            n_events=20_000, batch_per_channel=1 << 15,
            wmax_quantile=0.9999, per_channel_max=pc, **CUTS)
        print(f"unweighted [{tag}]: {len(events)} events  "
              f"efficiency {eff:.4%}  overweight {n_over}", flush=True)

    # 7. the production scheme: PARTIAL unweighting at a working quantile
    # (accepts carry max(1, w/w_max) — exactly unbiased, ~10x the
    # effective events of the strict bound; measured study in
    # docs/PERFORMANCE.md) written straight to an LHE 3.0 event file.
    events, xbs, wts, info = mcl.multichannel_unweight(
        channels, flows, out["best_params"], ss, matrix_element,
        E_COLLIDER, jax.random.PRNGKey(9), out["best_alphas"],
        n_events=20_000, batch_per_channel=1 << 15,
        wmax_quantile=0.9, per_channel_max=True, partial_unweight=True,
        **CUTS)
    sig_pb = float(sig_mc) / 2.56819e-9  # GeV^-2 -> pb (reference const)
    path = _os.path.join("/tmp", "zz_multichannel.lhe")
    from nf_tpu.utils.lhe import write_lhe
    # average XWGTUP = sigma_pb (IDWTUP=4): normalize the carried weights
    # to unit mean; write_lhe multiplies by the unit weight (= sigma_pb)
    write_lhe(path, events, pdgs=[2, -2, 11, -11, 13, -13],
              weights=wts / max(float(wts.mean()), 1e-300),
              xb=xbs, E_beam=E_COLLIDER / 2, sigma_pb=sig_pb,
              sigma_err_pb=float(err_mc) / 2.56819e-9)
    print(f"partial unweighting: {len(events)} events  effective eff "
          f"{info['eff']:.4%}  -> {path}", flush=True)


if __name__ == "__main__":
    main()
