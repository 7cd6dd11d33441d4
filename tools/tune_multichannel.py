"""Hyperparameter sweep for the learned multi-channel trainer.

The ZZ/Z' competing-pairings target (examples/zz_multichannel.py) is the
acceptance test for training/multichannel.py.  First production-scale
measurements showed the per-channel-flows mixture (var loss, lr 2e-3,
learned alphas) reaching 1.8% ESS where the simpler shared-flow-on-
fixed-alphas path reaches 4.0% — this sweep separates tuning from
structure: loss_mode (var vs secmom), learning rate, and whether the
Kleiss-Pittau alphas iterate during training or stay at their
pre-optimized values.

Run on TPU from the repo root (about 3-5 min per config incl. remote
compiles; configs sharing a learning rate reuse the compiled program):

    python tools/tune_multichannel.py [--batch 131072] [--epochs 300]
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from examples.zz_multichannel import (CUTS, E_COLLIDER, MZ, GZ, MZP, GZP,
                                      matrix_element)
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.phasespace.topology import (BreitWignerSMap,
                                        ResonanceDecayPhasespace,
                                        optimize_alphas)
from nf_tpu.training import multichannel as mcl
from nf_tpu.training import optimizers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 17,
                    help="batch_per_channel")
    ap.add_argument("--epochs", type=int, default=300)
    args = ap.parse_args()

    common = dict(pdf=ToyPDF(), pdf_active=True, tau=True)
    channels = [
        ResonanceDecayPhasespace(
            [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
            mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                       (2, 3): BreitWignerSMap(MZ, GZ)}, **common),
        ResonanceDecayPhasespace(
            [0.0, 0.0], [0.0] * 4, ((0, 3), (1, 2)),
            mass_maps={(0, 3): BreitWignerSMap(MZP, GZP),
                       (1, 2): BreitWignerSMap(MZP, GZP)}, **common),
    ]
    alphas, _ = optimize_alphas(matrix_element, channels, [0.5, 0.5],
                                E_COLLIDER, jax.random.PRNGKey(1),
                                n_iter=4, n_samples=1 << 15, **CUTS)
    print(f"KP alphas: {alphas.round(4)}", flush=True)

    configs = [
        ("kl     lr2e-3 learnA", "kl", 2e-3, True),
        ("kl     lr5e-3 learnA", "kl", 5e-3, True),
        ("kl     lr2e-3 fixedA", "kl", 2e-3, False),
        # measured r4 (see docs/PERFORMANCE.md): var/secmom plateau ~2%
        ("var    lr2e-3 learnA", "var", 2e-3, True),
        ("secmom lr5e-3 learnA", "secmom", 5e-3, True),
    ]
    for tag, loss_mode, lr, learn_a in configs:
        flows, ps, ss = mcl.build_channel_flows(
            jax.random.PRNGKey(0), channels, 4, 16, [32] * 2, final_rank=4)
        t0 = time.time()
        out = mcl.train_multichannel(
            channels, flows, ps, ss, matrix_element, E_COLLIDER,
            optimizers.adamax(lr, 1e-4), jax.random.PRNGKey(3),
            alphas=list(alphas), batch_per_channel=args.batch,
            epochs=args.epochs, loss_mode=loss_mode, learn_alphas=learn_a,
            mini_batch_per_channel=min(args.batch, 1 << 16),
            epochs_per_call=args.epochs // 12 if args.epochs % 12 == 0
            else None, **CUTS)
        h = out["history"]["ess"]
        traj = " ".join(f"{h[i]:.3%}" for i in
                        range(0, len(h), max(1, len(h) // 8)))
        print(f"[{tag}] {time.time() - t0:.0f}s  best {out['best_ess']:.4%} "
              f"final {h[-1]:.4%}  alphas {out['best_alphas'].round(3)}\n"
              f"   ess traj: {traj}", flush=True)


if __name__ == "__main__":
    main()
