"""Calibrate Mosaic per-op VPU costs (exp/sqrt/div/fma/select) on TPU.

Why: the kernel roofline (bench.py ``kernel_roofline``,
``pwquad_sampler.estimate_vpu_ops``) prices transcendentals with assumed
lowering costs (exp=8, atan=20).  Two r4 measurements strain that
assumption: ``activation="squareplus"`` (replacing exp with 2 FMA + sqrt,
nominally 5 < 8 ops) measured SLOWER than exp, and the measured rank-4
flagship speedup (1.572x) matches the static op model almost exactly at
exp_cost ~= 2 (predicted ratios: 1.43 at exp=8, 1.56 at exp=2, 1.62 at
exp=0) — both consistent with exp being a cheap hardware-assisted op and
sqrt an expensive one.  If exp ~= 2, (a) every cheap-positivity
substitution is a dead end by construction, and (b) the "90% of VPU peak"
roofline fractions are overstated and should be re-normalized.

Method: a Pallas kernel applies a self-stabilizing op chain K times to a
[sub, 128] f32 tile (each iterate feeds the next, so nothing dead-code
eliminates; fixed points keep values finite for any K).  Per-op-time =
slope between two K values, launched inside one lax.scan so dispatch
latency cancels (bench.paired_scan_rate protocol), loop/load overheads
cancel in the K-difference.  Costs are reported in units of the measured
fma chain (the VPU's 1-op yardstick).

Run from /root/repo on TPU:  python - < tools/calibrate_vpu_ops.py
On CPU it runs in interpret mode as a smoke test (timings meaningless).
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

LANE, SUB = 128, 32

# op name -> one chain step y -> f(y); each has a finite attracting fixed
# point so a K-long chain stays in a healthy f32 range
CHAINS = {
    "fma": lambda y: y * 0.9990234375 + 0.001,          # -> ~1.024
    "mul": lambda y: y * 0.9999,                        # -> decays slowly
    "add": lambda y: 1.0 - (y - 1.0) * -1.0 + 0.0,      # placeholder, below
    "exp": lambda y: jnp.exp(y * 0.0009765625),         # -> ~1.001
    "sqrt": lambda y: jnp.sqrt(y + 1.0),                # -> golden ratio
    "rsqrt": lambda y: jax.lax.rsqrt(y + 1.0),          # bounded orbit
    "div": lambda y: 2.0 / (y + 1.0),                   # -> 1
    "log": lambda y: jnp.log(y + 2.0),                  # -> ~1.146
    "tanh": lambda y: jnp.tanh(y) + 0.5,                # -> ~1.08
    "select": lambda y: jnp.where(y > 1.0, y * 0.9, y * 1.05 + 0.01),
}
CHAINS["add"] = lambda y: (y + 0.001) * 1.0  # mul by literal 1.0 folds away


def build_chain_kernel(op, K, grid=256, interpret=False):
    step = CHAINS[op]

    def kernel(seed_ref, out_ref):
        i = pl.program_id(0)
        y = (
            jax.lax.broadcasted_iota(jnp.float32, (SUB, LANE), 1) / LANE
            + 0.5
            + jnp.float32(1e-6) * i.astype(jnp.float32)
            + seed_ref[0].astype(jnp.float32) * 1e-6
        )
        for _ in range(K):
            y = step(y)
        # accumulate across grid steps so every step's work is live
        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[...] += y

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        interpret=interpret,
    )


def time_launch(fn, arg, reps=8):
    jax.block_until_ready(fn(arg))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        best = min(best, time.perf_counter() - t0)
    return best


def chain_rate_sec_per_op(op, grid, interpret, k1=64, k2=320, scans=(2, 10)):
    """Seconds per single chain op per element, dispatch- and overhead-free."""
    def scanned(K, m):
        kern = build_chain_kernel(op, K, grid=grid, interpret=interpret)

        @jax.jit
        def run(seed0):
            def body(acc, j):
                r = kern(jnp.asarray([seed0 + j], jnp.int32))
                return acc + r[0, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(m, dtype=jnp.int32))
            return acc
        return run

    m1, m2 = scans
    elems = SUB * LANE * grid
    ts = {}
    for K in (k1, k2):
        t_a = time_launch(scanned(K, m1), jnp.int32(1))
        t_b = time_launch(scanned(K, m2), jnp.int32(1))
        ts[K] = (t_b - t_a) / (m2 - m1)          # one launch, no dispatch
    return (ts[k2] - ts[k1]) / ((k2 - k1) * elems)


def main():
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    grid = 1024 if on_tpu else 2
    k1, k2 = (64, 320) if on_tpu else (2, 4)
    scans = (2, 10) if on_tpu else (1, 2)

    out = {"device": str(jax.devices()[0]), "grid": grid,
           "elements_per_launch": SUB * LANE * grid,
           "sec_per_op_per_element": {}, "cost_in_fma_units": {}}
    for op in CHAINS:
        sec = chain_rate_sec_per_op(op, grid, interpret, k1, k2, scans)
        out["sec_per_op_per_element"][op] = sec
        print(f"# {op:7s}: {sec:.3e} s/op/elem "
              f"({1.0 / max(sec, 1e-30):.3e} ops/s)", flush=True)

    fma = out["sec_per_op_per_element"]["fma"]
    for op, sec in out["sec_per_op_per_element"].items():
        out["cost_in_fma_units"][op] = sec / fma
    print("\n| op | cost (fma units) |")
    print("|---|---|")
    for op, c in sorted(out["cost_in_fma_units"].items(), key=lambda kv: kv[1]):
        print(f"| {op} | {c:.2f} |")

    with open("/tmp/calibrate_vpu_ops.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("\n# wrote /tmp/calibrate_vpu_ops.json")
    if not on_tpu:
        print("# (CPU interpret mode: numbers are NOT hardware costs)")


if __name__ == "__main__":  # `python - < file` also sets __main__
    main()
