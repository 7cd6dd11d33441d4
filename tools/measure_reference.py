"""Measure the PyTorch reference baseline (BASELINE.md: "to measure").

Runs the reference (imported from its read-only mount, never copied) on the
camel-2D README configuration and on flow sampling throughput, and prints a
JSON blob to record in BASELINE_MEASURED.md.  CPU-only, single process —
exactly how the reference ships.

Usage: python tools/measure_reference.py [--epochs 300]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=10000)
    args = ap.parse_args()

    from nisrep.normalizing_flows.manager import PWQuadManager

    def camel(x):
        return (torch.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.2 ** 2)
                + torch.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.2 ** 2))

    torch.manual_seed(0)
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
        "torch_threads": torch.get_num_threads(),
    }, indent=2))


if __name__ == "__main__":
    main()
