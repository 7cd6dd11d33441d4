"""Measure the PyTorch reference baseline (BASELINE.md: "to measure").

Runs the reference (imported from its read-only mount, never copied) on the
camel-2D README configuration and on flow sampling throughput, and prints a
JSON blob to record in BASELINE_MEASURED.md.  CPU-only, single process —
exactly how the reference ships.

``--dy`` instead measures the Drell-Yan 2->2 head-to-head row (VERDICT r3
next-step #8): the reference's own FlatInvertiblePhasespace with the tau
convolution (flat_phase_space_generator.py:154-187) driven by a torch port
of nf_tpu's analytic ToyPDF (so both frameworks integrate the IDENTICAL
physics; real lhapdf is absent in this image and is shimmed out), trained
with the reference's variance scheme, reporting the unweighting efficiency
w_mean/w_max on fresh samples — the reference's own protocol
(utils/experiment_mg.py:66-76,101).

Usage: python tools/measure_reference.py [--epochs 300] [--dy]
"""

import argparse
import json
import sys
import time
import types

sys.path.insert(0, "/root/reference")

import numpy as np
import torch


class TorchToyPDF:
    """Torch port of nf_tpu.phasespace.pdf.ToyPDF (x f = N x^a (1-x)^b) —
    the analytic stand-in both frameworks share for the DY head-to-head."""

    _params = {
        21: (3.0, -0.2, 5.0),
        1: (0.7, 0.5, 4.0), 2: (1.4, 0.5, 3.0),
        -1: (0.2, -0.2, 6.0), -2: (0.15, -0.2, 6.0),
        3: (0.15, -0.2, 6.0), -3: (0.15, -0.2, 6.0),
        4: (0.08, -0.2, 6.0), -4: (0.08, -0.2, 6.0),
        5: (0.03, -0.2, 6.0), -5: (0.03, -0.2, 6.0),
    }

    def xfxQ2(self, pdg, x, q2):
        n, a, b = self._params.get(int(pdg), (1.0, 0.0, 0.0))
        x = torch.clamp(x, 1e-10, 1.0)
        return n * x ** a * (1.0 - x) ** b


def unweighting_efficiency(NF, f, n=100_000):
    """w_mean/w_max on fresh samples from best_model — the reference's own
    protocol (utils/experiment_mg.py:66-76,101)."""
    dev = torch.device("cpu")
    w = torch.empty(n, NF.n_flow, dtype=torch.double)
    torch.nn.init.uniform_(w)
    with torch.no_grad():
        X = NF.best_model(NF.format_input(w, dev))
    wt = (f(X[:, :-1]) * X[:, -1]).detach()
    ess = float(wt.mean() ** 2 / (wt ** 2).mean())
    return float(wt.mean() / wt.max()), ess


def measure_dy(args):
    """Reference framework on the shared Drell-Yan 2->2 target."""
    # the reference unconditionally imports lhapdf when pdf_active=True
    # (flat_phase_space_generator.py:37-39); absent here -> shim the import
    # (the pdf OBJECT we pass is the torch ToyPDF above, never lhapdf)
    sys.modules.setdefault("lhapdf", types.ModuleType("lhapdf"))
    from nisrep.PhaseSpace.flat_phase_space_generator import (
        FlatInvertiblePhasespace)
    from nisrep.normalizing_flows.manager import PWQuadManager

    E_COLLIDER = 2000.0
    GEV2_TO_PB = 2.56819e-9
    MZ2, GZ = 91.188 ** 2, 2.4952

    gen = FlatInvertiblePhasespace(
        [0.0, 0.0], [0.0, 0.0], pdf=TorchToyPDF(), pdf_active=True, tau=True)
    n_flow = gen.nDimPhaseSpace() + 2

    def integrand(w):
        momenta, wgt = gen.generateKinematics_batch(
            E_COLLIDER, w, pT_mincut=10.0, rap_maxcut=2.4, pdgs=[2, -2])
        p = momenta[:, 0, :] + momenta[:, 1, :]
        shat = p[:, 0] ** 2 - p[:, 1] ** 2 - p[:, 2] ** 2 - p[:, 3] ** 2
        return 1e4 / ((shat - MZ2) ** 2 + MZ2 * GZ ** 2) * wgt

    torch.manual_seed(args.seed)
    NF = PWQuadManager(n_flow=n_flow)
    NF.create_model(args.dy_cells, args.dy_bins,
                    [args.dy_width] * 2)
    optim = torch.optim.Adamax(NF._model.parameters(), lr=2e-3,
                               weight_decay=1e-4)
    import tempfile
    t0 = time.time()
    sig, sig_err = NF._train_variance_forward_seq(
        integrand, optim, False, tempfile.mkdtemp(), args.batch, args.epochs,
        0, pretty_progressbar=False, save_best=True, run=None,
        mini_batch_size=args.batch, integrate=True,
        preburn_time=args.preburn)
    train_seconds = time.time() - t0

    eff, ess = unweighting_efficiency(NF, integrand)
    sig2, sig_err2 = NF.integrate(integrand, 8, 1 << 19)
    analytic_pb = 3.6568  # scipy.quad reduction, tests/test_physics_validation.py
    print(json.dumps({
        "config": f"DY 2->2 tau-convolved ToyPDF, PWQuad({args.dy_cells},"
                  f"{args.dy_bins},[{args.dy_width}]*2), batch {args.batch},"
                  f" epochs {args.epochs}, preburn {args.preburn}",
        "train_sigma_pb": float(sig) / GEV2_TO_PB,
        "train_sigma_err_pb": float(sig_err) / GEV2_TO_PB,
        "integrate_sigma_pb": float(sig2) / GEV2_TO_PB,
        "integrate_sigma_err_pb": float(sig_err2) / GEV2_TO_PB,
        "analytic_sigma_pb": analytic_pb,
        "unweighting_efficiency": eff,
        "ess_fraction": ess,
        "train_seconds": train_seconds,
        "torch_threads": torch.get_num_threads(),
    }, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=10000)
    ap.add_argument("--dy", action="store_true",
                    help="measure the Drell-Yan head-to-head row instead")
    ap.add_argument("--dy-cells", type=int, default=4)
    ap.add_argument("--dy-bins", type=int, default=16)
    ap.add_argument("--dy-width", type=int, default=16)
    ap.add_argument("--preburn", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.dy:
        return measure_dy(args)

    from nisrep.normalizing_flows.manager import PWQuadManager

    def camel(x):
        return (torch.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.2 ** 2)
                + torch.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.2 ** 2))

    torch.manual_seed(args.seed)
    NF = PWQuadManager(n_flow=2)
    NF.create_model(2, 4, [3] * 3)
    optim = torch.optim.Adamax(NF._model.parameters(), lr=2e-3, weight_decay=1e-4)

    t0 = time.time()
    import tempfile
    logdir = tempfile.mkdtemp()
    sig, sig_err = NF._train_variance_forward_seq(
        camel, optim, False, logdir, args.batch, args.epochs, 0,
        pretty_progressbar=False, save_best=True, run=None,
        mini_batch_size=args.batch, integrate=True, preburn_time=50)
    train_seconds = time.time() - t0

    # post-training integrate at fixed neval (matches nf_tpu bench protocol)
    t0 = time.time()
    sig2, sig_err2 = NF.integrate(camel, 10, 100_000)
    integrate_seconds = time.time() - t0

    # unweighting efficiency, reference protocol (experiment_mg.py:66-76)
    unweight_eff, ess_frac = unweighting_efficiency(NF, camel)

    # sampling throughput: latent -> flow forward (best_model), like the
    # nf_tpu sampler benches
    n = 1 << 18
    w = torch.empty(n, 2).to(torch.double)
    torch.nn.init.uniform_(w)
    with torch.no_grad():
        NF.best_model(NF.format_input(w, torch.device("cpu")))  # warm
        reps = []
        for _ in range(5):
            torch.nn.init.uniform_(w)
            t0 = time.time()
            NF.best_model(NF.format_input(w, torch.device("cpu")))
            reps.append(time.time() - t0)
    samples_per_sec = n / min(reps)

    exact = 0.23232357060637815
    print(json.dumps({
        "config": f"camel-2D PWQuad create_model(2,4,[3]*3), batch {args.batch}, "
                  f"epochs {args.epochs}, preburn 50 (README.md:32-46)",
        "train_integral": float(sig),
        "train_integral_err": float(sig_err),
        "integrate_integral": float(sig2),
        "integrate_integral_err": float(sig_err2),
        "exact": exact,
        "rel_err": abs(float(sig2) - exact) / exact,
        "train_seconds": train_seconds,
        "integrate_seconds": integrate_seconds,
        "flow_samples_per_sec_cpu": samples_per_sec,
        "unweighting_efficiency": unweight_eff,
        "ess_fraction": ess_frac,
        "torch_threads": torch.get_num_threads(),
    }, indent=2))


if __name__ == "__main__":
    main()
