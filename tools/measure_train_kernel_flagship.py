"""Follow-up flagship train-kernel measurements (r4 continuation).

1. Re-measure the flagship raw fused fwd+bwd step with a wider paired-scan
   k spread (the first run's k1=1/k2=5 differencing returned a negative —
   tunnel jitter exceeded the 4-step signal).
2. Test the dW-accumulation hypothesis from docs/TRAIN_KERNEL.md: the
   flagship stale trainer with final_rank=4 carries ~5x fewer folded
   final-layer params, so if dW terms dominate the backward, the rate
   should rise well above the dense 1.0e7/s.

Run from /root/repo:  python - < tools/measure_train_kernel_flagship.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from measure_train_kernel import manager_rate, paired_rate
from nf_tpu.flows import factory
from nf_tpu.ops import pwquad_train as ptk
from nf_tpu.training import optimizers


def raw_step_rate_wide(build, f, B):
    flow, params, state = build(jax.random.PRNGKey(0))
    fused = ptk.make_fused_train_fn(flow, ptk.fold_flow_jnp(flow, params,
                                                            state)[1])
    opt = optimizers.adamax(2e-3, 1e-4)
    opt_state = opt.init(params)

    def step(key):
        w = jax.random.uniform(key, (B, flow.n_flow), dtype=jnp.float32)

        def loss(p):
            fl, _ = ptk.fold_flow_jnp(flow, p, state)
            x, jac = fused(fl, w)
            fx = f(jax.lax.stop_gradient(x))
            r = fx * jac
            return jnp.mean((r - jnp.mean(r)) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        upd, _ = opt.update(g, opt_state, params)
        return l + sum(jnp.sum(v) for v in jax.tree.leaves(upd))

    return paired_rate(step, B, k1=2, k2=22, reps=6)


if __name__ == "__main__":
    t0 = time.time()
    out = {"device": str(jax.devices()[0])}
    flat10 = lambda x: jnp.ones(x.shape[0], x.dtype)

    out["flagship_raw_fused_step_widek"] = raw_step_rate_wide(
        lambda k: factory.build_pwquad_flow(k, 10, 8, 8, (16, 16),
                                            jnp.float32), flat10, 1 << 18)
    print(f"# flagship raw fused step (k 2->22) @256k: "
          f"{out['flagship_raw_fused_step_widek']:.3e}/s", flush=True)

    out["flagship_rank4_raw_fused_step"] = raw_step_rate_wide(
        lambda k: factory.build_pwquad_flow(k, 10, 8, 8, (16, 16),
                                            jnp.float32, final_rank=4),
        flat10, 1 << 18)
    print(f"# flagship rank-4 raw fused step @256k: "
          f"{out['flagship_rank4_raw_fused_step']:.3e}/s", flush=True)

    out["flagship_manager_stale_rank4"] = manager_rate(
        10, (8, 8, [16, 16]), flat10, 1 << 20, 1 << 18, "stale",
        create_kwargs={"final_rank": 4})
    print(f"# flagship manager[stale, rank4] @1M(mb256k): "
          f"{out['flagship_manager_stale_rank4']:.3e}/s", flush=True)

    out["elapsed_sec"] = time.time() - t0
    with open("/tmp/measure_train_kernel_flagship.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
