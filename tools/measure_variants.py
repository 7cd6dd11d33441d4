"""Measure the conditioner-cost reducers on TPU (VERDICT r3 #2 + #3).

Part A — fused-kernel device rate (paired-scan differencing) for the
flagship 10-D masked flow across (final_rank, activation) variants, each
gated by a take-latents kernel-vs-folded-jnp exactness check.

Part B — trainer chunk throughput at 1M batch: dim_major (lane-efficient
transposed forward_t) vs batch_major (reference layout).

Run from /root/repo:  python - < tools/measure_variants.py
(PYTHONPATH must stay unset for axon plugin registration.)
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from bench import paired_scan_rate, time_sampler, camel
from nf_tpu.flows import factory
from nf_tpu.flows.fast_eval import make_folded_forward
from nf_tpu.ops.pwquad_sampler import build_sampler, estimate_vpu_ops

VPU_PEAK = 3.9e12


def part_a():
    n_fl = 1 << 21
    results = {}
    for fr, act in [(None, "exp"), (8, "exp"), (4, "exp"),
                    (2, "exp"), (1, "exp"),
                    (None, "squareplus"), (4, "squareplus"),
                    (2, "squareplus")]:
        tag = f"rank{fr}_{act}"
        flow, p, s = factory.build_pwquad_flow(
            jax.random.PRNGKey(7), 10, 8, 8, (16, 16), jnp.float32,
            final_rank=fr, activation=act)
        # exactness gate on identical latents
        lat = build_sampler(flow, p, s, take_latents=True)
        w_chk = jax.random.uniform(jax.random.PRNGKey(99), (1 << 14, 10),
                                   dtype=jnp.float32)
        x_k, j_k = jax.jit(lat)(w_chk)
        x_r, j_r = jax.jit(make_folded_forward(flow, p, s))(w_chk)
        exact = bool(jnp.allclose(x_k, x_r, rtol=1e-4, atol=2e-5)
                     and jnp.allclose(j_k, j_r, rtol=1e-3))
        sampler = build_sampler(flow, p, s, layout="dim_major")
        rate = paired_scan_rate(sampler, n_fl, k1=2, k2=10)
        ops = estimate_vpu_ops(flow)
        results[tag] = {
            "device_samples_per_sec": rate,
            "exact_vs_jnp": exact,
            "ops_per_sample_est": ops,
            "fraction_of_vpu_peak": rate * ops / VPU_PEAK,
        }
        print(f"# {tag}: {rate:.3e}/s exact={exact} "
              f"ops={ops} frac_peak={rate*ops/VPU_PEAK:.2f}", flush=True)
    return results


def part_b():
    from nf_tpu.training.manager import PWQuadManager
    from nf_tpu.training import optimizers

    out = {}
    for layout in ("dim_major", "batch_major"):
        NF = PWQuadManager(n_flow=2, seed=2)
        NF.create_model(2, 4, [3] * 3)
        NF._train_variance_forward_seq(
            camel, optimizers.adamax(2e-3, 1e-4), log=False,
            batch_size=1_000_000, epochs=6, pretty_progressbar=False,
            mini_batch_size=1_000_000, integrate=False, preburn_time=0,
            epochs_per_sync=6, train_layout=layout)
        sec_e, sps = NF.benchmark_train_step(reps=3)
        out[layout] = {"sec_per_epoch": sec_e, "samples_per_sec": sps}
        print(f"# train[{layout}] @1M: {sps:.3e} samples/s", flush=True)

    # flagship-shaped training config (10-D, 8 cells): the capability target
    for layout in ("dim_major", "batch_major"):
        NF = PWQuadManager(n_flow=10, seed=3)
        NF.create_model(8, 8, [16, 16])

        def flat10(x):
            return jnp.ones(x.shape[0], x.dtype)

        NF._train_variance_forward_seq(
            flat10, optimizers.adamax(2e-3, 1e-4), log=False,
            batch_size=1 << 20, epochs=6, pretty_progressbar=False,
            mini_batch_size=1 << 18, integrate=False, preburn_time=0,
            epochs_per_sync=6, train_layout=layout)
        sec_e, sps = NF.benchmark_train_step(reps=3)
        out[f"flagship_{layout}"] = {"sec_per_epoch": sec_e,
                                     "samples_per_sec": sps}
        print(f"# train flagship[{layout}] @1M(mb 256k): {sps:.3e} samples/s",
              flush=True)
    return out


if __name__ == "__main__":
    t0 = time.time()
    res = {"kernel_variants": part_a(), "train_layout": part_b(),
           "device": str(jax.devices()[0]), "elapsed_sec": time.time() - t0}
    with open("/tmp/measure_variants.json", "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
