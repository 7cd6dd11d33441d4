"""Device-time profile of the fused Pallas sampler (VERDICT r2 item 1).

The round-2 headline (7.8e7 samples/s) was measured as min wall-clock over
single 2M-sample dispatches — in this environment every dispatch crosses a
host->TPU tunnel with a fixed latency of tens of ms, so a ~25 ms RTT fully
masks a kernel that may be running 10-100x faster on device.  This script
separates fixed per-dispatch overhead from true per-sample device time
three ways:

  1. dispatch-overhead floor: round-trip of a trivial jitted scalar op;
  2. scaling fit: min-time vs n over a 32x range -> slope (device rate)
     + intercept (overhead);
  3. paired-K differencing: run K sampler calls chained in one lax.scan
     inside ONE jit/dispatch; (t(K2) - t(K1)) / ((K2-K1)*n) is a pure
     device-time-per-sample measurement with the overhead cancelled exactly.

Also sweeps tile_sub and compares batch-major (transpose copy) vs dim-major
output layouts, for both the camel-2D config and the 10-D flagship.
Prints a JSON report (the basis of BENCH_r03's kernel_roofline block).
"""

import json
import time

import jax
import jax.numpy as jnp

from nf_tpu.flows import factory
from nf_tpu.ops.pwquad_sampler import build_sampler


def timeit(fn, *args, reps=10):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def scanned_runner(sampler, n, K):
    """One jit that runs the sampler K times and reduces the outputs."""
    @jax.jit
    def run(seed0):
        def body(acc, i):
            x, j = sampler(seed0 + i, n)
            return acc + j[0] + x[0][0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
        return acc
    return run


def profile_flow(tag, flow, params, state, n=1 << 21, subs=(8, 32, 64, 128, 256)):
    out = {"tag": tag, "n_per_call": n}

    # scaling fit (default tile_sub, batch-major = the production endpoint)
    sampler = build_sampler(flow, params, state)
    jfn = jax.jit(lambda s: sampler(s, n), static_argnums=())
    ns = [n >> 3, n >> 1, n << 1, n << 3]
    ts = []
    for ni in ns:
        f = jax.jit(lambda s, ni=ni: sampler(s, ni))
        ts.append(timeit(f, jnp.int32(1)))
    import numpy as np
    A = np.vstack([ns, np.ones(len(ns))]).T
    slope, intercept = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
    out["scaling_fit"] = {
        "ns": ns, "ts": ts,
        "device_rate_samples_per_sec": 1.0 / slope if slope > 0 else None,
        "per_dispatch_overhead_sec": float(intercept),
    }

    # paired-K differencing per tile_sub, dim-major (kernel-only time)
    sweep = {}
    for sub in subs:
        try:
            s_dm = build_sampler(flow, params, state, tile_sub=sub,
                                 layout="dim_major")
            r1 = scanned_runner(s_dm, n, 4)
            r2 = scanned_runner(s_dm, n, 12)
            t1 = timeit(r1, jnp.int32(1))
            t2 = timeit(r2, jnp.int32(1))
            rate = (8 * n) / (t2 - t1)
            sweep[sub] = {"t_k4": t1, "t_k12": t2,
                          "device_samples_per_sec": rate}
        except Exception as e:
            sweep[sub] = {"error": f"{type(e).__name__}: {e}"}
    out["tile_sub_sweep_dim_major"] = sweep

    # layout comparison at the best sub
    best_sub = max((s for s in sweep if "device_samples_per_sec" in sweep[s]),
                   key=lambda s: sweep[s]["device_samples_per_sec"])
    s_bm = build_sampler(flow, params, state, tile_sub=best_sub,
                         layout="batch_major")
    r1 = scanned_runner(s_bm, n, 4)
    r2 = scanned_runner(s_bm, n, 12)
    rate_bm = (8 * n) / (timeit(r2, jnp.int32(1)) - timeit(r1, jnp.int32(1)))
    out["best_tile_sub"] = best_sub
    out["batch_major_device_samples_per_sec"] = rate_bm
    out["dim_major_device_samples_per_sec"] = \
        sweep[best_sub]["device_samples_per_sec"]

    # bytes written per sample (x + jac, f32): HBM write-roofline utilization
    n_flow = flow.n_flow
    bytes_per_sample = 4 * (n_flow + 1)
    peak_bw = 819e9  # v5e HBM bandwidth, bytes/s
    rate = sweep[best_sub]["device_samples_per_sec"]
    out["roofline"] = {
        "bytes_per_sample": bytes_per_sample,
        "write_gb_per_sec": rate * bytes_per_sample / 1e9,
        "write_bw_utilization_of_819GBps": rate * bytes_per_sample / peak_bw,
    }
    return out


def main():
    report = {"backend": jax.default_backend(),
              "device": str(jax.devices()[0])}

    # dispatch-overhead floor
    one = jnp.float32(1.0)
    trivial = jax.jit(lambda x: x + 1.0)
    report["dispatch_overhead_sec"] = timeit(trivial, one, reps=20)

    key = jax.random.PRNGKey(0)
    flow2, p2, s2 = factory.build_pwquad_flow(key, 2, 2, 4, (3, 3, 3),
                                              jnp.float32)
    report["camel2d"] = profile_flow("camel2d", flow2, p2, s2)

    flow10, p10, s10 = factory.build_pwquad_flow(
        jax.random.PRNGKey(7), 10, 8, 8, (16, 16), jnp.float32)
    report["flagship10d"] = profile_flow("flagship10d", flow10, p10, s10,
                                         subs=(8, 32, 64, 128))

    print(json.dumps(report, indent=2, default=float))


if __name__ == "__main__":
    main()
