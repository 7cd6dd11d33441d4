"""Decompose the training step's device time (VERDICT r3 next-step #3).

The 1M-batch trainer runs ~8e7 samples/s while the eval paths run 4e8/s
(folded XLA) / 7e9/s (Pallas kernel) on the same camel-2D flow, and the
dim-major relayout measured as a no-op — so the gap is NOT lane padding.
This tool bisects the trainer into additive stages, each timed with
paired-scan differencing (dispatch-free, see bench.paired_scan_rate):

  rng          uniform latent generation alone
  fwd_folded   folded eval forward (BN pre-folded into weights)
  fwd_eval     stateful eval forward (running-stats BN, unfolded)
  fwd_train    train forward (batch-stats BN)
  grad_evalbn  value_and_grad of the var loss, BN in eval mode
  grad         value_and_grad of the var loss, batch-stats BN
  step         grad + adamax update (the full epoch body sans scan)

Successive differences isolate: BN folding, batch statistics, the
backward pass, and the optimizer.  Run from /root/repo on TPU:
    python - < tools/profile_train_step.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from bench import time_sampler, camel
from nf_tpu.flows import factory, fast_eval, model as fmodel
from nf_tpu.training import optimizers


def paired_rate(fn, n_per_call, k1=2, k2=10, reps=5):
    """Device samples/s of ``fn(key) -> scalar`` via scan differencing."""
    def scanned(K):
        @jax.jit
        def run(seed0):
            def body(acc, i):
                return acc + fn(jax.random.fold_in(
                    jax.random.PRNGKey(0), seed0 + i)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(K, dtype=jnp.int32))
            return acc
        return run
    t1 = time_sampler(scanned(k1), jnp.int32(1), reps=reps)
    t2 = time_sampler(scanned(k2), jnp.int32(1), reps=reps)
    return ((k2 - k1) * n_per_call) / (t2 - t1)


def leaves_scalar(tree):
    return sum(jnp.sum(l) for l in jax.tree.leaves(tree)
               if jnp.issubdtype(l.dtype, jnp.floating))


def profile(tag, build, f, B):
    flow, params, state = build(jax.random.PRNGKey(0))
    n = flow.n_flow
    folded_fwd = fast_eval.make_folded_forward(flow, params, state)
    opt = optimizers.adamax(2e-3, 1e-4)
    opt_state = opt.init(params)

    def rng(key):
        return jnp.sum(jax.random.uniform(key, (B, n), dtype=jnp.float32)
                       [:, 0])

    def fwd_folded(key):
        w = jax.random.uniform(key, (B, n), dtype=jnp.float32)
        x, jac = folded_fwd(w)
        return jnp.sum(jac) + x[0, 0]

    def make_fwd(train):
        def fn(key):
            w = jax.random.uniform(key, (B, n), dtype=jnp.float32)
            x, jac, new_bn = fmodel.forward(flow, params, state, w, train)
            return jnp.sum(jac) + x[0, 0] + leaves_scalar(new_bn)
        return fn

    def make_grad(train):
        def fn(key):
            w = jax.random.uniform(key, (B, n), dtype=jnp.float32)

            def loss(p):
                x, jac, new_bn = fmodel.forward(flow, p, state, w, train)
                fx = f(jax.lax.stop_gradient(x))
                r = fx * jac
                return jnp.mean((r - jnp.mean(r)) ** 2), new_bn

            (l, nb), g = jax.value_and_grad(loss, has_aux=True)(params)
            return l + leaves_scalar(g) + leaves_scalar(nb)
        return fn

    def step(key):
        w = jax.random.uniform(key, (B, n), dtype=jnp.float32)

        def loss(p):
            x, jac, new_bn = fmodel.forward(flow, p, state, w, True)
            fx = f(jax.lax.stop_gradient(x))
            r = fx * jac
            return jnp.mean((r - jnp.mean(r)) ** 2), new_bn

        (l, nb), g = jax.value_and_grad(loss, has_aux=True)(params)
        upd, new_opt = opt.update(g, opt_state, params)
        new_p = jax.tree.map(lambda p, u: p + u, params, upd)
        return l + leaves_scalar(new_p) + leaves_scalar(nb)

    out = {}
    for name, fn in [("rng", rng), ("fwd_folded", fwd_folded),
                     ("fwd_eval", make_fwd(False)),
                     ("fwd_train", make_fwd(True)),
                     ("grad_evalbn", make_grad(False)),
                     ("grad", make_grad(True)), ("step", step)]:
        r = paired_rate(fn, B)
        out[name] = {"samples_per_sec": r, "ns_per_sample": 1e9 / r}
        print(f"# {tag}.{name}: {r:.3e}/s  ({1e9/r:.2f} ns/sample)",
              flush=True)
    return out


if __name__ == "__main__":
    t0 = time.time()
    res = {
        "camel2d_1m": profile(
            "camel2d", lambda k: factory.build_pwquad_flow(
                k, 2, 2, 4, (3, 3, 3), jnp.float32), camel, 1 << 20),
        "flagship10d_256k": profile(
            "flagship", lambda k: factory.build_pwquad_flow(
                k, 10, 8, 8, (16, 16), jnp.float32),
            lambda x: jnp.ones(x.shape[0], x.dtype), 1 << 18),
        "device": str(jax.devices()[0]),
        "elapsed_sec": time.time() - t0,
    }
    with open("/tmp/profile_train_step.json", "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
