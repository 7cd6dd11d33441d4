"""Measure (not estimate) the dW-accumulation bound of the fused trainer.

VERDICT r4 item 5: docs/TRAIN_KERNEL.md's claim that the flagship
backward is bound by the dW/db accumulation (~2 VPU ops/sample/param)
rests on op-count arithmetic plus one rank-4 point.  This tool measures it
directly, two independent ways:

  1. **skip_dw differencing**: the backward kernel compiled with
     ``skip_dw=True`` (full transform VJP + input-cotangent chain, NO
     dW/db accumulation) vs the full backward — the rate difference IS
     the dW term, isolated.
  2. **parameter-count regression**: raw fused fwd+bwd step time across
     final_rank in {dense, 8, 4, 2, 1} on the 10-D flagship, regressed
     against the folded parameter count (n_grad_rows).  The slope is the
     measured ns/sample/param; the intercept is the parameter-free floor
     (transform VJP + recompute + staging) — the best any dW optimization
     could reach.

Run from /root/repo on TPU:  python tools/measure_dw_bound.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from bench import time_sampler
from nf_tpu.flows import factory
from nf_tpu.ops import pwquad_train as ptk

B = 1 << 18  # per-step samples (flagship-trainer minibatch size)
VPU_PEAK = 3.9e12


def paired_step_rate(step, n_per_call, k1=1, k2=5, reps=5):
    """Paired differencing with a DYNAMIC trip count: one while_loop jit
    serves both K values, so each kernel variant pays exactly ONE remote
    Pallas compile (~500 s in this environment) instead of two — the
    fixed per-dispatch tunnel cost still cancels in the difference."""
    @jax.jit
    def run(seed0, K):
        def cond(c):
            return c[0] < K
        def body(c):
            i, acc = c
            return i + 1, acc + step(seed0 + i)
        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), jnp.float32(0.0)))[1]
    t1 = time_sampler(run, jnp.int32(1), jnp.int32(k1), reps=reps)
    t2 = time_sampler(run, jnp.int32(1), jnp.int32(k2), reps=reps)
    return ((k2 - k1) * n_per_call) / (t2 - t1)


def fwd_bwd_rate(flow, params, state, skip_dw=False, n=B):
    flat, meta = ptk.fold_flow_jnp(flow, params, state)
    flat = list(flat)
    fwd, bwd = ptk.build_train_kernels(flow, meta, skip_dw=skip_dw)

    def step(seed):
        w = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(0),
                                                  seed),
                               (n, flow.n_flow), dtype=jnp.float32)
        x, jac, stage = fwd(flat, w)
        jbar = jnp.ones_like(jac)
        grads, wbar = bwd(flat, stage, jac, jbar, jnp.zeros_like(x))
        return (jac[0] + wbar[0, 0]
                + sum(g.reshape(-1)[0] for g in grads)).astype(jnp.float32)

    return paired_step_rate(step, n)


def bwd_only_rate(flow, params, state, skip_dw, n=B):
    flat, meta = ptk.fold_flow_jnp(flow, params, state)
    flat = list(flat)
    fwd, bwd = ptk.build_train_kernels(flow, meta, skip_dw=skip_dw)
    w = jax.random.uniform(jax.random.PRNGKey(1), (n, flow.n_flow),
                           dtype=jnp.float32)
    x0, jac0, stage0 = jax.jit(lambda: fwd(flat, w), static_argnums=())()
    x0, jac0, stage0 = map(jax.block_until_ready, (x0, jac0, stage0))
    zeros = jnp.zeros_like(x0)

    def step(seed):
        jbar = jnp.full_like(jac0, 1.0) * (1.0 + 1e-9 * seed)
        grads, wbar = bwd(flat, stage0, jac0, jbar, zeros)
        return (wbar[0, 0]
                + sum(g.reshape(-1)[0] for g in grads)).astype(jnp.float32)

    return paired_step_rate(step, n)


def n_params(flow, params, state):
    _, meta = ptk.fold_flow_jnp(flow, params, state)
    _, _, n_grad_rows = ptk._plan(flow, meta)
    return n_grad_rows


ALL_RANKS = {"dense": None, "rank8": 8, "rank4": 4, "rank2": 2, "rank1": 1}


def main():
    ap = argparse.ArgumentParser()
    # default ladder: the extremes + the production point — 3 points span
    # the full param-count range for the regression at ~half the remote
    # Pallas compiles of the 5-point ladder
    ap.add_argument("--ranks", default="dense,rank4,rank1")
    ap.add_argument("--fwd-bwd", action="store_true",
                    help="also measure the combined fwd+bwd step rate "
                         "(adds one Pallas compile per rank)")
    ap.add_argument("--camel", action="store_true",
                    help="also run the camel-2D control (params ~ free)")
    args = ap.parse_args()
    out = {"batch": B}

    # ---- flagship ladder: dense + ranks, full vs skip_dw backward ----
    ranks = [(n, ALL_RANKS[n]) for n in args.ranks.split(",")]
    ladder = {}
    for name, rank in ranks:
        flow, p, s = factory.build_pwquad_flow(
            jax.random.PRNGKey(7), 10, 8, 8, (16, 16), jnp.float32,
            final_rank=rank)
        P = n_params(flow, p, s)
        full = bwd_only_rate(flow, p, s, skip_dw=False)
        nodw = bwd_only_rate(flow, p, s, skip_dw=True)
        ladder[name] = {"params_folded": P,
                        "bwd_full_samples_per_sec": full,
                        "bwd_skip_dw_samples_per_sec": nodw,
                        "dw_ns_per_sample": 1e9 * (1 / full - 1 / nodw),
                        "dw_ns_per_sample_per_param":
                            1e9 * (1 / full - 1 / nodw) / P}
        if args.fwd_bwd:
            ladder[name]["fwd_bwd_samples_per_sec"] = fwd_bwd_rate(
                flow, p, s, skip_dw=False)
        print(name, json.dumps(ladder[name]), flush=True)
    out["flagship10d"] = ladder

    # regression: t(P) = c0 + c1*P over the full backward
    Ps = np.array([v["params_folded"] for v in ladder.values()], float)
    ts = np.array([1.0 / v["bwd_full_samples_per_sec"]
                   for v in ladder.values()])
    c1, c0 = np.polyfit(Ps, ts, 1)
    out["regression"] = {
        "intercept_ns_per_sample": c0 * 1e9,
        "slope_ps_per_sample_per_param": c1 * 1e12,
        "implied_vpu_ops_per_sample_per_param": c1 * VPU_PEAK,
        "zero_param_floor_samples_per_sec": 1.0 / c0,
    }

    if args.camel:
        # ---- camel control (params ~ free: dW term should be ~0) ----
        flow2, p2, s2 = factory.build_pwquad_flow(
            jax.random.PRNGKey(0), 2, 2, 4, (3, 3, 3), jnp.float32)
        out["camel2d"] = {
            "params_folded": n_params(flow2, p2, s2),
            "bwd_full_samples_per_sec": bwd_only_rate(flow2, p2, s2, False,
                                                      n=1 << 20),
            "bwd_skip_dw_samples_per_sec": bwd_only_rate(flow2, p2, s2, True,
                                                         n=1 << 20),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
