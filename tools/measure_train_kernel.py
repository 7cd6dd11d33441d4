"""Measure the fused training kernel's device rate on TPU (r5 first move).

Compares, with paired-scan differencing (dispatch-free), the per-epoch
device cost of:

  A. the reference-semantics XLA trainer (bn_stats="batch")
  B. the stale-stats fused-kernel trainer (bn_stats="stale")
  C. the raw fused fwd+bwd step (kernel pair without the manager)

on the camel-2D 1M-batch config (VERDICT r3 #3 bar: >= 4e8 samples/s)
and the flagship 10-D config.  The cost model (docs/TRAIN_KERNEL.md)
predicts ~1-2e9/s camel and ~3-4e7/s flagship for B/C.

Run from /root/repo on TPU:  python - < tools/measure_train_kernel.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from bench import time_sampler, camel
from nf_tpu.flows import factory
from nf_tpu.ops import pwquad_train as ptk
from nf_tpu.training import optimizers
from nf_tpu.training.manager import PWQuadManager


def paired_rate(fn, n_per_call, k1=1, k2=5, reps=5):
    def scanned(K):
        @jax.jit
        def run(seed0):
            def body(acc, i):
                return acc + fn(jax.random.fold_in(
                    jax.random.PRNGKey(0), seed0 + i)), None
            a, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(K, dtype=jnp.int32))
            return a
        return run
    t1 = time_sampler(scanned(k1), jnp.int32(1), reps=reps)
    t2 = time_sampler(scanned(k2), jnp.int32(1), reps=reps)
    return ((k2 - k1) * n_per_call) / (t2 - t1)


def manager_rate(n_flow, create_args, f, batch, mini_batch, layout_mode,
                 create_kwargs=None):
    NF = PWQuadManager(n_flow=n_flow, seed=2)
    NF.create_model(*create_args, **(create_kwargs or {}))
    NF._train_variance_forward_seq(
        f, optimizers.adamax(2e-3, 1e-4), log=False, batch_size=batch,
        epochs=6, pretty_progressbar=False, mini_batch_size=mini_batch,
        integrate=False, preburn_time=0, epochs_per_sync=6,
        bn_stats=layout_mode)
    sec_e, sps = NF.benchmark_train_step(reps=3)
    return sps


def raw_step_rate(build, f, B):
    flow, params, state = build(jax.random.PRNGKey(0))
    flat0, meta = ptk.fold_flow_jnp(flow, params, state)
    fused = ptk.make_fused_train_fn(flow, meta)
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

    return paired_rate(step, B)


if __name__ == "__main__":
    t0 = time.time()
    out = {"device": str(jax.devices()[0])}

    out["camel_raw_fused_step"] = raw_step_rate(
        lambda k: factory.build_pwquad_flow(k, 2, 2, 4, (3, 3, 3),
                                            jnp.float32), camel, 1 << 20)
    print(f"# camel raw fused step @1M: {out['camel_raw_fused_step']:.3e}/s",
          flush=True)

    for mode in ("batch", "stale"):
        out[f"camel_manager_{mode}"] = manager_rate(
            2, (2, 4, [3] * 3), camel, 1 << 20, 1 << 20, mode)
        print(f"# camel manager[{mode}] @1M: "
              f"{out[f'camel_manager_{mode}']:.3e}/s", flush=True)

    flat10 = lambda x: jnp.ones(x.shape[0], x.dtype)
    out["flagship_raw_fused_step"] = raw_step_rate(
        lambda k: factory.build_pwquad_flow(k, 10, 8, 8, (16, 16),
                                            jnp.float32), flat10, 1 << 18)
    print(f"# flagship raw fused step @256k: "
          f"{out['flagship_raw_fused_step']:.3e}/s", flush=True)
    for mode in ("batch", "stale"):
        out[f"flagship_manager_{mode}"] = manager_rate(
            10, (8, 8, [16, 16]), flat10, 1 << 20, 1 << 18, mode)
        print(f"# flagship manager[{mode}] @1M(mb256k): "
              f"{out[f'flagship_manager_{mode}']:.3e}/s", flush=True)

    out["elapsed_sec"] = time.time() - t0
    with open("/tmp/measure_train_kernel.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
