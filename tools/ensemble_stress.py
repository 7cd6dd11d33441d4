"""TPU-scale ensemble stress run (VERDICT r2 item 6 'Done' criterion).

Runs the r2 crash configuration — 64 runs x batch 10000 — through
``train_ensemble(runs_per_call="auto")`` and reports the chosen group size
and per-run results.  Pass ``--full-width`` to additionally attempt the
UNGROUPED 64-wide program (`runs_per_call=None`) to (re)capture the remote
runtime fault signature; expect the worker connection to die if the fault
still reproduces, which is why it is opt-in and last.

Usage:  python - < tools/ensemble_stress.py      (auto grouping only)
        python tools/ensemble_stress.py --full-width   (from repo root)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nf_tpu.flows import factory
from nf_tpu.training import optimizers
from nf_tpu.training.ensemble import stack_ensemble, train_ensemble


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def main():
    def init(k):
        return factory.build_pwquad_flow(k, 2, 4, 4, (8, 8), jnp.float32)

    flow, p_stack, s_stack = stack_ensemble(init, jax.random.PRNGKey(0), 64)
    opt = optimizers.adamax(3e-3)

    t0 = time.time()
    res = train_ensemble(flow, p_stack, s_stack, camel, opt,
                         jax.random.PRNGKey(1), batch_size=10000, epochs=40,
                         preburn_time=0, kill_counter=100,
                         runs_per_call="auto", verbose=True)
    dt = time.time() - t0
    bl = np.asarray(res["best_loss"])
    print(f"auto grouping: 64 runs x batch 10000 COMPLETED in {dt:.1f}s, "
          f"group_size={res['group_size']}")
    print(f"best_loss: median {np.median(bl):.4g}  "
          f"range [{bl.min():.4g}, {bl.max():.4g}]  finite={np.isfinite(bl).all()}")

    if "--full-width" in sys.argv:
        print("attempting UNGROUPED 64-wide program (fault-signature "
              "capture)...", flush=True)
        try:
            res = train_ensemble(flow, p_stack, s_stack, camel, opt,
                                 jax.random.PRNGKey(1), batch_size=10000,
                                 epochs=40, preburn_time=0, kill_counter=100,
                                 runs_per_call=None)
            print("full-width program completed (fault did NOT reproduce)")
        except Exception as e:
            print(f"full-width FAULT signature: {type(e).__name__}: {e}")


if __name__ == "__main__":  # `python - < file` also sets __name__ to __main__
    main()
