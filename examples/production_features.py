"""Round-2 production features on the README camel target.

Demonstrates, end to end:
  * training with the default chunked on-device state machine;
  * exact stop/resume (save_training_state / resume_from);
  * production sampling/integration (fused Pallas kernel on TPU,
    reference-parity path elsewhere; method= forces either);
  * randomized-QMC integration (100x+ smaller error at equal budget);
  * density evaluation q(x) via the folded inverse;
  * a vmapped ensemble seed sweep in one jit.

Run: python examples/production_features.py   (CPU or TPU)
"""

import math
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from nf_tpu import PWQuadManager
from nf_tpu.flows import factory
from nf_tpu.flows.fast_eval import make_density
from nf_tpu.training import optimizers
from nf_tpu.training.ensemble import stack_ensemble, train_ensemble


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def camel_exact():
    g = 0.2 * (math.sqrt(math.pi) / 2) * (math.erf(0.25 / 0.2) + math.erf(0.75 / 0.2))
    return 2 * g * g


def main():
    exact = camel_exact()
    opt = optimizers.adamax(2e-3, 1e-4)

    # ---- train 40 epochs, save, resume for 40 more (exact continuation)
    NF = PWQuadManager(n_flow=2, seed=0)
    NF.create_model(2, 4, [3] * 3)
    NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=8000, epochs=40,
        pretty_progressbar=False, mini_batch_size=8000, integrate=False,
        preburn_time=10, epochs_per_sync=1)
    NF.save_training_state("/tmp/camel_train.pkl")
    NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=8000, epochs=40, epoch_start=40,
        pretty_progressbar=False, mini_batch_size=8000, integrate=False,
        preburn_time=10, epochs_per_sync=1,
        resume_from="/tmp/camel_train.pkl")
    print(f"trained 80 epochs (resumed at 40): best_loss {NF.best_loss:.3e}")

    # ---- production integration, three ways
    sig, err = NF.integrate(camel, 10, 100_000, seed=1)
    print(f"integrate (auto):   {sig:.6f} +/- {err:.1e}  "
          f"(dev {abs(sig - exact):.1e})")
    sig_m, err_m = NF.integrate(camel, 10, 100_000, seed=1, combine="mean")
    print(f"integrate (mean):   {sig_m:.6f} +/- {err_m:.1e}")
    sig_q, err_q = NF.integrate(camel, 8, 65_536, seed=1, method="qmc")
    print(f"integrate (qmc):    {sig_q:.6f} +/- {err_q:.1e}  "
          f"(dev {abs(sig_q - exact):.1e})")

    # ---- density evaluation q(x) (folded inverse)
    q = jax.jit(make_density(NF._flow, *NF.best_params, dtype=NF.dtype))
    pts = jnp.asarray([[0.25, 0.25], [0.75, 0.75], [0.25, 0.75]], NF.dtype)
    print("model density q(x) at the modes / anti-mode:",
          np.round(np.asarray(q(pts)), 3),
          "(target density there:",
          np.round(np.asarray(camel(pts)) / exact, 3), ")")

    # ---- vmapped ensemble: 8 seeds in one jit
    def init(k):
        return factory.build_pwquad_flow(k, 2, 4, 4, (3, 3, 3), NF.dtype)
    flow, ps, ss = stack_ensemble(init, jax.random.PRNGKey(3), 8)
    res = train_ensemble(flow, ps, ss, camel, opt, jax.random.PRNGKey(4),
                         batch_size=8000, epochs=60, preburn_time=10,
                         kill_counter=1000, dtype=NF.dtype)
    print("ensemble of 8 seeds, best losses:",
          np.round(np.sort(np.asarray(res["best_loss"])), 4))
    print("ensemble integral estimates:",
          np.round(np.asarray(res["integ_tot"]), 4), f"(exact {exact:.4f})")

    # ---- r4: the fused-training-kernel trainer (stale-stats BN).  On TPU
    # the whole train step (forward + hand-derived backward) runs in Pallas
    # kernels (docs/TRAIN_KERNEL.md); off-TPU the identical frozen-stats
    # math runs in XLA, so the flag is portable.
    NF4 = PWQuadManager(n_flow=2, seed=5)
    NF4.create_model(2, 4, [3] * 3)
    NF4._train_variance_forward_seq(
        camel, opt, log=False, batch_size=8000, epochs=60,
        pretty_progressbar=False, mini_batch_size=8000, integrate=False,
        preburn_time=10, bn_stats="stale")
    sig_s, err_s = NF4.integrate(camel, 10, 100_000, seed=2)
    print(f"stale-BN (fused-kernel) trainer: integral {sig_s:.6f} "
          f"+/- {err_s:.1e}  (dev {abs(sig_s - exact):.1e})")

    # ---- r4: low-rank final conditioners for the 10-D flagship shape —
    # measured 1.57x fused-kernel rate at NO trained-quality cost for
    # rank 4 (docs/PERFORMANCE.md rank study); stays exactly bijective
    NF5 = PWQuadManager(n_flow=10, seed=6)
    NF5.create_model(8, 8, [16, 16], final_rank=4)
    _, jac10 = NF5.sample(1 << 13, key=jax.random.PRNGKey(9))
    print(f"rank-4 flagship flow: E[jac] = {float(jac10.mean()):.4f} "
          "(exactly-normalized sampler, untrained)")


if __name__ == "__main__":
    main()
