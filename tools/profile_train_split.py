"""Split the XLA train step's cost between conditioner and transform stage.

profile_train_step.py showed the trainer's true device rate is ~1.6e8
samples/s @1M camel (fwd 4.9e8/s, bwd ~2.9x fwd) while the fused eval
kernel does 7.15e9/s — the XLA path is ~15x off on identical math.  The
op counts say VPU compute is NOT the reason; the gap is fusion-boundary
materialization (cumsum / one-hot-reduce / reshape break XLA fusions, so
every [B, t, n_bins] intermediate round-trips HBM).

This tool pins WHERE: it times forward and value_and_grad with (a) the
full model, (b) the transform stage stubbed out (conditioner z reduced
directly into the jacobian proxy), (c) the conditioner stubbed (constant
z broadcast; transform math intact), and (d) full model under
jax.checkpoint per cell (remat trades HBM residual traffic for
recompute — a win if the path is bandwidth-bound).

Run from /root/repo on TPU:  python - < tools/profile_train_split.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from bench import time_sampler, camel
from nf_tpu.bijectors import conditioner, coupling
from nf_tpu.flows import factory, model as fmodel


def paired_rate(fn, n_per_call, k1=2, k2=10, reps=5):
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


def forward_variant(flow, params, state, w, mode):
    """model.forward with stage stubs.  mode: full | no_transform | no_mlp
    | remat (full, jax.checkpoint around each cell)."""
    x = w
    jac = jnp.ones((w.shape[0],), w.dtype)
    for op in flow.ops:
        tag = op[0]
        if tag == "cell":
            idx = op[1]
            cfg = flow.cells[idx]

            def cell(x, jac, idx=idx, cfg=cfg):
                xA = x[:, :cfg.pass_through]
                xB = x[:, cfg.pass_through:]
                t = xB.shape[1]
                if mode == "no_mlp":
                    # constant conditioner output, still x-dependent so the
                    # VJP chain through xA survives
                    z = jnp.zeros((x.shape[0],
                                   cfg.nn_sizes[-1]), x.dtype) \
                        + jnp.mean(xA, axis=1, keepdims=True) * 1e-3
                else:
                    z, _ = conditioner.apply(params[idx], state[idx], xA,
                                             True, None)
                if mode == "no_transform":
                    # reduce z straight into the jacobian; keep xB moving
                    # through a cheap smooth bijection so shapes/deps hold
                    yB = xB * 0.5 + 0.25
                    factor = 1.0 + jnp.tanh(jnp.sum(z, axis=1)) * 1e-6
                else:
                    xBc = jnp.minimum(xB, 1.0 - 1e-6)
                    z3 = z.reshape(z.shape[0], t, 2 * cfg.n_bins + 1)
                    yB, factor = coupling.pwquad_compute(
                        z3[:, :, : cfg.n_bins + 1],
                        z3[:, :, cfg.n_bins + 1:], xBc, cfg.activation)
                return jnp.concatenate([xA, yB], axis=1), jac * factor

            if mode == "remat":
                x, jac = jax.checkpoint(cell)(x, jac)
            else:
                x, jac = cell(x, jac)
        elif tag == "roll":
            x = jnp.roll(x, op[1], axis=1)
        elif tag == "gather":
            x = x[:, np.asarray(op[1])]
        elif tag == "scatter":
            inv = np.empty(len(op[1]), dtype=np.int64)
            inv[np.asarray(op[1])] = np.arange(len(op[1]))
            x = x[:, inv]
    return x, jac


def profile(tag, build, f, B):
    flow, params, state = build(jax.random.PRNGKey(0))
    n = flow.n_flow
    out = {}
    for mode in ("full", "no_transform", "no_mlp", "remat"):
        def fwd(key, mode=mode):
            w = jax.random.uniform(key, (B, n), dtype=jnp.float32)
            x, jac = forward_variant(flow, params, state, w, mode)
            return jnp.sum(jac) + x[0, 0]

        def grad(key, mode=mode):
            w = jax.random.uniform(key, (B, n), dtype=jnp.float32)

            def loss(p):
                x, jac = forward_variant(flow, p, state, w, mode)
                fx = f(jax.lax.stop_gradient(x))
                r = fx * jac
                return jnp.mean((r - jnp.mean(r)) ** 2)

            l, g = jax.value_and_grad(loss)(params)
            return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

        rf, rg = paired_rate(fwd, B), paired_rate(grad, B)
        out[mode] = {"fwd": rf, "grad": rg}
        print(f"# {tag}.{mode}: fwd {rf:.3e}/s  grad {rg:.3e}/s", flush=True)
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
    with open("/tmp/profile_train_split.json", "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
