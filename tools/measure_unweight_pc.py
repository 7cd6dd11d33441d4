"""Measure global-max vs per-channel-max mixture unweighting on TPU.

Trains the learned multi-channel (per-channel flows, reweighted-KL) on
the ZZ/Z' competing-pairings target (examples/zz_multichannel.py setup)
and compares `multichannel_unweight` in both modes at the same
wmax_quantile.  The per-channel scheme's analytic gain is
``C * max_k(alpha_k w_max_k) / sum_k(alpha_k w_max_k)`` (up to C×).

Usage: python tools/measure_unweight_pc.py [--epochs 200] [--batch 65536]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from examples.zz_multichannel import (CUTS, E_COLLIDER, MZ, GZ, MZP, GZP,
                                      matrix_element)
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.phasespace.topology import (BreitWignerSMap,
                                        ResonanceDecayPhasespace)
from nf_tpu.training import multichannel as mcl
from nf_tpu.training import optimizers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1 << 16)
    ap.add_argument("--n-events", type=int, default=50_000)
    ap.add_argument("--quantile", type=float, default=0.9999)
    args = ap.parse_args()

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

    flows, ps, ss = mcl.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 16, [32] * 2, final_rank=4)
    cache = f"/tmp/zz_mc_params_{args.epochs}_{args.batch}.pkl"
    if os.path.exists(cache):
        import pickle
        with open(cache, "rb") as fh:
            out = pickle.load(fh)
        print(f"loaded cached params ({cache}): best_ess "
              f"{out['best_ess']:.4%}", flush=True)
    else:
        t0 = time.time()
        out = mcl.train_multichannel(
            channels, flows, ps, ss, matrix_element, E_COLLIDER,
            optimizers.adamax(5e-3, 1e-4), jax.random.PRNGKey(3),
            alphas=[0.7, 0.3], batch_per_channel=args.batch,
            epochs=args.epochs, loss_mode="kl",
            mini_batch_per_channel=min(args.batch, 1 << 16),
            epochs_per_call=args.epochs // 10 if args.epochs % 10 == 0
            else None, **CUTS)
        print(f"train {time.time() - t0:.0f}s  best_ess "
              f"{out['best_ess']:.4%}  alphas "
              f"{out['best_alphas'].round(3)}", flush=True)
        import pickle
        out_h = dict(out)
        out_h["best_params"] = jax.device_get(out["best_params"])
        with open(cache, "wb") as fh:
            pickle.dump(out_h, fh)

    for tag, pc in (("global-max", False), ("per-channel-max", True)):
        t0 = time.time()
        events, _, eff, n_over = mcl.multichannel_unweight(
            channels, flows, out["best_params"], ss, matrix_element,
            E_COLLIDER, jax.random.PRNGKey(7), out["best_alphas"],
            n_events=args.n_events, batch_per_channel=1 << 15,
            wmax_quantile=args.quantile, per_channel_max=pc, **CUTS)
        print(f"{tag:16s}: {len(events)} events  eff {eff:.4%}  "
              f"overweight {n_over}  ({time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
