"""nf_tpu side of the head-to-head table (VERDICT r3 next-step #8).

Mirrors tools/measure_reference.py configuration-for-configuration so the
BASELINE_MEASURED.md efficiency table compares identical physics and
identical hyperparameters:

  default : camel-2D README config — PWQuad(2,4,[3]*3), Adamax(2e-3, wd
            1e-4), batch 10000, preburn 50, then integrate(10, 100k) and
            the reference's own unweighting protocol w_mean/w_max on fresh
            samples (reference nisrep/utils/experiment_mg.py:66-76,101).
  --dy    : Drell-Yan 2->2 with the tau convolution and the analytic
            ToyPDF (the torch run uses a port of the SAME ToyPDF, so both
            frameworks integrate identical physics) — PWQuad(4,16,[16]*2),
            batch 10000, preburn 20.

Run from /root/repo (PYTHONPATH unset for axon plugin registration):
    python - --dy < tools/measure_nf_tpu.py
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nf_tpu import PWQuadManager, FlatInvertiblePhasespace
from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.training import optimizers

GEV2_TO_PB = 2.56819e-9


def unweighting_efficiency(NF, f, n=100_000, key=None):
    """w_mean/w_max on fresh samples from the best model — the reference's
    own protocol (nisrep/utils/experiment_mg.py:66-76,101)."""
    x, jac = NF.sample(n, key=key or jax.random.PRNGKey(17))
    wt = f(x) * jac
    eff = float(jnp.mean(wt) / jnp.max(wt))
    ess = float(jnp.mean(wt) ** 2 / jnp.mean(wt ** 2))
    return eff, ess


def measure_camel(args):
    def camel(x):
        return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
                + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))

    NF = PWQuadManager(n_flow=2, seed=args.seed)
    NF.create_model(2, 4, [3] * 3)
    t0 = time.time()
    sig, sig_err = NF._train_variance_forward_seq(
        camel, optimizers.adamax(2e-3, 1e-4), log=False,
        batch_size=args.batch, epochs=args.epochs,
        pretty_progressbar=False, mini_batch_size=args.batch,
        integrate=True, preburn_time=50)
    train_seconds = time.time() - t0

    t0 = time.time()
    sig2, sig_err2 = NF.integrate(camel, 10, 100_000, seed=11)
    integrate_seconds = time.time() - t0
    eff, ess = unweighting_efficiency(NF, camel)

    exact = 0.23232357060637815
    print(json.dumps({
        "config": f"camel-2D PWQuad create_model(2,4,[3]*3), batch "
                  f"{args.batch}, epochs {args.epochs}, preburn 50",
        "backend": jax.default_backend(),
        "train_integral": float(sig),
        "train_integral_err": float(sig_err),
        "integrate_integral": float(sig2),
        "integrate_integral_err": float(sig_err2),
        "exact": exact,
        "rel_err": abs(float(sig2) - exact) / exact,
        "train_seconds": train_seconds,
        "integrate_seconds": integrate_seconds,
        "unweighting_efficiency": eff,
        "ess_fraction": ess,
    }, indent=2))


def measure_dy(args):
    E_COLLIDER = 2000.0
    MZ2, GZ = 91.188 ** 2, 2.4952

    gen = FlatInvertiblePhasespace([0.0, 0.0], [0.0, 0.0], pdf=ToyPDF(),
                                   pdf_active=True, tau=True)
    n_flow = gen.nDimPhaseSpace() + 2

    def integrand(w):
        momenta, wgt = gen.generateKinematics_batch(
            E_COLLIDER, w, pT_mincut=10.0, rap_maxcut=2.4, pdgs=(2, -2))
        shat = lorentz.square(momenta[:, 0, :] + momenta[:, 1, :])
        return 1e4 / ((shat - MZ2) ** 2 + MZ2 * GZ ** 2) * wgt

    NF = PWQuadManager(n_flow=n_flow, seed=args.seed)
    NF.create_model(args.dy_cells, args.dy_bins, [args.dy_width] * 2)
    t0 = time.time()
    sig, sig_err = NF._train_variance_forward_seq(
        integrand, optimizers.adamax(2e-3, 1e-4), log=False,
        batch_size=args.batch, epochs=args.epochs,
        pretty_progressbar=False, mini_batch_size=args.batch,
        integrate=True, preburn_time=args.preburn)
    train_seconds = time.time() - t0

    eff, ess = unweighting_efficiency(NF, integrand)
    sig2, sig_err2 = NF.integrate(integrand, 8, 1 << 19, seed=11)
    # the reference's iw combination biases LOW on resonant heavy tails
    # (documented in BasicManager.integrate); report the unbiased pooled
    # mean too so the table can show both
    sig3, sig_err3 = NF.integrate(integrand, 8, 1 << 19, seed=11,
                                  combine="mean")
    analytic_pb = 3.6568  # scipy.quad reduction, tests/test_physics_validation.py
    print(json.dumps({
        "config": f"DY 2->2 tau-convolved ToyPDF, PWQuad({args.dy_cells},"
                  f"{args.dy_bins},[{args.dy_width}]*2), batch {args.batch},"
                  f" epochs {args.epochs}, preburn {args.preburn}",
        "backend": jax.default_backend(),
        "train_sigma_pb": float(sig) / GEV2_TO_PB,
        "train_sigma_err_pb": float(sig_err) / GEV2_TO_PB,
        "integrate_sigma_pb": float(sig2) / GEV2_TO_PB,
        "integrate_sigma_err_pb": float(sig_err2) / GEV2_TO_PB,
        "integrate_sigma_pb_mean_combine": float(sig3) / GEV2_TO_PB,
        "integrate_sigma_err_pb_mean_combine": float(sig_err3) / GEV2_TO_PB,
        "analytic_sigma_pb": analytic_pb,
        "unweighting_efficiency": eff,
        "ess_fraction": ess,
        "train_seconds": train_seconds,
    }, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=10000)
    ap.add_argument("--dy", action="store_true")
    ap.add_argument("--dy-cells", type=int, default=4)
    ap.add_argument("--dy-bins", type=int, default=16)
    ap.add_argument("--dy-width", type=int, default=16)
    ap.add_argument("--preburn", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.dy:
        return measure_dy(args)
    return measure_camel(args)


if __name__ == "__main__":  # `python - < file` also sets __name__ to __main__
    main()
