"""Benchmark: production-endpoint sampling throughput + camel-2D accuracy.

Headline metric per BASELINE.json: samples/sec/chip on the README camel-2D
configuration (PWQuadManager.create_model(2, 4, [3]*3)), measured through
the PRODUCTION API (``BasicManager.sample``, which auto-selects the fused
Pallas kernel on TPU) at a production-scale 16M-sample call, with the
relative error of the trained integral vs the analytic camel value as the
accuracy gate.  vs_baseline is measured against the 1e7 samples/sec/chip
north star.  ``kernel_roofline`` carries the true device rate (paired-scan
differencing cancels this environment's fixed ~24 ms per-Pallas-dispatch
tunnel latency) and the measured limiter: the VPU issue rate, ~90% of
peak — NOT HBM writes (see tools/profile_kernel.py, VERDICT r2 item 1).

Prints ONE JSON line.
"""

import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def camel_exact():
    g = 0.2 * (math.sqrt(math.pi) / 2) * (math.erf(0.25 / 0.2) + math.erf(0.75 / 0.2))
    return 2 * g * g


def time_sampler(fn, *args, reps=20):
    fn(*args)  # compile + warm
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def paired_scan_rate(sampler, n, k1=2, k2=34, reps=6):
    """True per-sample DEVICE time of a ``sampler(seed, n)`` kernel.

    Runs k sampler launches chained in ONE lax.scan/jit (one dispatch) and
    differences two k values, so the fixed per-dispatch cost — ~24 ms for
    any executable containing a Pallas call in this tunnel-attached
    environment, measured in tools/profile_kernel.py — cancels exactly.
    """
    def scanned(K):
        @jax.jit
        def run(seed0):
            def body(acc, i):
                x, j = sampler(seed0 + i, n)
                return acc + j[0] + x[0][0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(K, dtype=jnp.int32))
            return acc
        return run
    t1 = time_sampler(scanned(k1), jnp.int32(1), reps=reps)
    t2 = time_sampler(scanned(k2), jnp.int32(1), reps=reps)
    return ((k2 - k1) * n) / (t2 - t1)


def main():
    from nf_tpu import PWQuadManager
    from nf_tpu.training import optimizers
    from nf_tpu.flows import model as fmodel
    from nf_tpu.ops.pwquad_sampler import build_sampler

    on_tpu = jax.default_backend() == "tpu"

    # ---- train the README camel config (reference README.md:32-46);
    # epochs_per_sync defaults to "auto": check_time-aligned jit chunks
    NF = PWQuadManager(n_flow=2, seed=0)
    NF.create_model(2, 4, [3] * 3)
    opt = optimizers.adamax(2e-3, 1e-4)
    t_train0 = time.time()
    NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=10000, epochs=150,
        pretty_progressbar=False, mini_batch_size=10000, integrate=False,
        preburn_time=20)
    train_time = time.time() - t_train0

    # warm training wall-clock: identical second run (compiles cached) —
    # the per-run cost once the one-time compilation is paid
    NF_w = PWQuadManager(n_flow=2, seed=1)
    NF_w.create_model(2, 4, [3] * 3)
    t_w = time.time()
    NF_w._train_variance_forward_seq(
        camel, optimizers.adamax(2e-3, 1e-4), log=False, batch_size=10000,
        epochs=150, pretty_progressbar=False, mini_batch_size=10000,
        integrate=False, preburn_time=20)
    train_time_warm = time.time() - t_w

    params, bn_state = NF.best_params

    # ---- TPU-exact kernel gate: the latents-operand kernel variant must
    # match the folded jnp path on identical latents before anything fused
    # is timed or trusted (statistical E[jac] gate kept as a backstop)
    kernel_exact = None
    if on_tpu:
        from nf_tpu.flows.fast_eval import make_folded_forward
        lat_sampler = build_sampler(NF._flow, params, bn_state,
                                    take_latents=True)
        w_chk = jax.random.uniform(jax.random.PRNGKey(99), (1 << 14, 2),
                                   dtype=jnp.float32)
        x_k, j_k = jax.jit(lat_sampler)(w_chk)
        x_r, j_r = jax.jit(make_folded_forward(NF._flow, params, bn_state))(w_chk)
        # tolerance bounds measured Mosaic-vs-XLA f32 math differences
        # (exp/div/reciprocal lowerings): x max abs ~5e-6, jac rel ~2e-5
        kernel_exact = bool(
            jnp.allclose(x_k, x_r, rtol=1e-4, atol=2e-5)
            and jnp.allclose(j_k, j_r, rtol=1e-3))
        if not kernel_exact:
            # never crash the bench: fall back to the reference-parity
            # sampling paths and record the failed gate in the JSON
            print("# KERNEL EXACTNESS GATE FAILED - falling back to "
                  "non-fused endpoints")

    # endpoints auto-select the fused kernel unless the gate failed
    ep_method = None if kernel_exact in (True, None) else "folded"

    # ---- accuracy at fixed neval through the production integrate()
    neval, nitn = 100_000, 10
    sig, sig_err = NF.integrate(camel, nitn, neval, seed=123,
                                method=ep_method)
    exact = camel_exact()
    rel_err = abs(sig - exact) / exact

    # randomized-QMC integrate: scrambled Sobol through the latents-operand
    # kernel; near-O(1/N) error (nf_tpu.utils.qmc)
    sig_qmc, err_qmc = NF.integrate(camel, 8, 65536, seed=11, method="qmc")
    rel_err_qmc = abs(sig_qmc - exact) / exact

    # unweighting efficiency w_mean/w_max on fresh samples
    # (reference measurement protocol, experiment_mg.py:66-76,101)
    x_u, jac_u = NF.sample(100_000, key=jax.random.PRNGKey(42),
                           method=ep_method)
    w_u = camel(x_u) * jac_u
    unweighting_eff = float(jnp.mean(w_u) / jnp.max(w_u))

    # ---- sampling throughput
    n = 1 << 21       # 2M samples per call (r1/r2-comparable)
    n_big = 1 << 24   # 16M: production-scale single call, amortizes the
    #                   fixed per-Pallas-dispatch latency of this tunnel env

    # PRODUCTION endpoint: NF.sample (fused kernel on TPU, E[jac] gate)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    x_s, j_s = NF.sample(n, key=keys[0], method=ep_method)
    assert bool(jnp.isfinite(j_s).all()), "sample() jac not finite"
    assert abs(float(j_s.mean()) - 1.0) < 0.02, (
        f"sample() E[jac]={float(j_s.mean())} != 1")
    endpoint_dt = time_sampler(lambda: NF.sample(n, key=keys[1],
                                                 method=ep_method))
    endpoint_sps_2m = n / endpoint_dt
    endpoint_dt_big = time_sampler(lambda: NF.sample(n_big, key=keys[2],
                                                     method=ep_method),
                                   reps=10)
    endpoint_sps = n_big / endpoint_dt_big

    # PRODUCTION endpoint: NF.integrate throughput, warm (one jit dispatch
    # per call; r3 fused path launches the kernel per iteration in a scan)
    integrate_dt = time_sampler(
        lambda: NF.integrate(camel, nitn, neval, seed=5, method=ep_method),
        reps=10)
    integrate_sps = (nitn * neval) / integrate_dt
    # production-scale integrate: same per-call dispatch, 8x2M samples
    nitn_p, neval_p = 8, 1 << 21
    integrate_dt_p = time_sampler(
        lambda: NF.integrate(camel, nitn_p, neval_p, seed=5,
                             method=ep_method), reps=10)
    integrate_sps_p = (nitn_p * neval_p) / integrate_dt_p

    # raw fused Pallas sampler: per-call (incl. dispatch) + true device rate
    pallas_sps = 0.0
    pallas_device_sps = 0.0
    try:
        sampler = build_sampler(NF._flow, params, bn_state,
                                interpret=not on_tpu)
        jit_sampler = jax.jit(lambda seed: sampler(seed, n)) if on_tpu else None
        if on_tpu:
            xs, js = jit_sampler(jnp.int32(1))
            assert bool(jnp.isfinite(js).all()), "pallas jac not finite"
            assert bool(((xs >= 0) & (xs <= 1)).all()), "pallas x out of range"
            assert abs(float(js.mean()) - 1.0) < 0.02, (
                f"pallas E[jac]={float(js.mean())} != 1")
            pallas_sps = n / time_sampler(jit_sampler, jnp.int32(1))
            sampler_dm = build_sampler(NF._flow, params, bn_state,
                                       layout="dim_major")
            pallas_device_sps = paired_scan_rate(sampler_dm, n)
    except Exception as e:
        print(f"# pallas sampler unavailable: {e}")

    # XLA stateful path (the reference-parity forward, manager.py:397)
    @jax.jit
    def xla_sample(key):
        w = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
        x, jac, _ = fmodel.forward(NF._flow, params, bn_state, w, False)
        return x, jac

    xla_sps = n / time_sampler(xla_sample, jax.random.PRNGKey(0))

    # XLA path with BN folded into the weights (nf_tpu.flows.fast_eval)
    from nf_tpu.flows.fast_eval import make_folded_forward_t
    folded = make_folded_forward_t(NF._flow, params, bn_state)

    @jax.jit
    def xla_folded_sample(key):
        w = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
        return folded(w)

    xla_folded_sps = n / time_sampler(xla_folded_sample, jax.random.PRNGKey(0))

    # scan-amortized device rate of the folded XLA path (the per-call
    # number above carries this env's ~25 ms constant-buffer dispatch
    # floor; see docs/PERFORMANCE.md "Per-dispatch latency")
    def xla_scanned(K):
        @jax.jit
        def run(key):
            def body(acc, i):
                w = jax.random.uniform(jax.random.fold_in(key, i), (n, 2),
                                       dtype=jnp.float32)
                x, j = folded(w)
                return acc + j[0] + x[0, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(K, dtype=jnp.int32))
            return acc
        return run
    t1 = time_sampler(xla_scanned(2), jax.random.PRNGKey(0), reps=6)
    t2 = time_sampler(xla_scanned(10), jax.random.PRNGKey(0), reps=6)
    xla_folded_device_sps = (8 * n) / (t2 - t1)

    # ---- secondary benches: flagship masked flow + 2->4 phase space w/ cuts
    flagship_sps = 0.0
    flagship_device_sps = 0.0
    flow10 = None
    try:
        from nf_tpu.flows import factory
        n_fl = 1 << 21
        flow10, p10, s10 = factory.build_pwquad_flow(
            jax.random.PRNGKey(7), 10, 8, 8, (16, 16), jnp.float32)
        if on_tpu:
            sampler10 = build_sampler(flow10, p10, s10)
            js10 = jax.jit(lambda seed: sampler10(seed, n_fl))
            flagship_sps = n_fl / time_sampler(js10, jnp.int32(3), reps=10)
            sampler10_dm = build_sampler(flow10, p10, s10,
                                         layout="dim_major")
            flagship_device_sps = paired_scan_rate(sampler10_dm, n_fl,
                                                   k1=2, k2=10)
    except Exception as e:
        print(f"# flagship sampler unavailable: {e}")

    # flagship with the r4 low-rank conditioner variant (final_rank=4):
    # exactness-gated vs the folded jnp path on identical latents, then
    # the device rate (measured r4: 2.17e8/s vs 1.38e8/s reference arch)
    flagship_r4_device_sps = 0.0
    flagship_r4_exact = None
    if on_tpu:
        try:
            from nf_tpu.flows.fast_eval import make_folded_forward
            flow10r, p10r, s10r = factory.build_pwquad_flow(
                jax.random.PRNGKey(7), 10, 8, 8, (16, 16), jnp.float32,
                final_rank=4)
            lat = build_sampler(flow10r, p10r, s10r, take_latents=True)
            w_chk = jax.random.uniform(jax.random.PRNGKey(99), (1 << 14, 10),
                                       dtype=jnp.float32)
            x_k, j_k = jax.jit(lat)(w_chk)
            x_r, j_r = jax.jit(make_folded_forward(flow10r, p10r, s10r))(w_chk)
            flagship_r4_exact = bool(
                jnp.allclose(x_k, x_r, rtol=1e-4, atol=2e-5)
                and jnp.allclose(j_k, j_r, rtol=1e-3))
            if flagship_r4_exact:
                s10_dm = build_sampler(flow10r, p10r, s10r,
                                       layout="dim_major")
                flagship_r4_device_sps = paired_scan_rate(s10_dm, n_fl,
                                                          k1=2, k2=10)
        except Exception as e:
            print(f"# flagship rank-4 variant unavailable: {e}")

    # ---- kernel roofline (VERDICT r2 item 1): measured sustained VPU
    # element-op rate vs the v5e VPU issue-rate peak, plus the HBM-write
    # fraction showing the kernel is NOT bandwidth-bound.  Op counts are
    # the static estimate from pwquad_sampler.estimate_vpu_ops (doc'd
    # +-30%); v5e peaks: ~3.9e12 f32 element-ops/s, 819 GB/s HBM.
    kernel_roofline = None
    if on_tpu and pallas_device_sps > 0:
        from nf_tpu.ops.pwquad_sampler import estimate_vpu_ops
        VPU_PEAK = 3.9e12
        HBM_BW = 819e9
        ops2 = estimate_vpu_ops(NF._flow)
        kernel_roofline = {
            "camel2d": {
                "device_samples_per_sec": pallas_device_sps,
                "ops_per_sample_est": ops2,
                "sustained_element_ops_per_sec": pallas_device_sps * ops2,
                "fraction_of_vpu_peak": pallas_device_sps * ops2 / VPU_PEAK,
                "write_bytes_per_sample": 12,
                "write_gb_per_sec": pallas_device_sps * 12 / 1e9,
                "fraction_of_hbm_write_bw": pallas_device_sps * 12 / HBM_BW,
            },
            "limiter": "VPU issue rate (compute-bound; exp lowering "
                       "dominates). NOT HBM-write-bound.",
            "per_pallas_dispatch_overhead_sec_this_env": 0.024,
        }
        if flagship_device_sps > 0 and flow10 is not None:
            ops10 = estimate_vpu_ops(flow10)
            kernel_roofline["flagship10d"] = {
                "device_samples_per_sec": flagship_device_sps,
                "ops_per_sample_est": ops10,
                "sustained_element_ops_per_sec":
                    flagship_device_sps * ops10,
                "fraction_of_vpu_peak":
                    flagship_device_sps * ops10 / VPU_PEAK,
                "write_bytes_per_sample": 44,
                "write_gb_per_sec": flagship_device_sps * 44 / 1e9,
                "fraction_of_hbm_write_bw":
                    flagship_device_sps * 44 / HBM_BW,
            }

    # ---- device-time training metric (VERDICT r2 item 5): the trainer's
    # own jitted chunk, warm, batch 10000 (the trained config) and a
    # TPU-sized 1M batch
    train_dev = {}
    try:
        sec_e, sps = NF_w.benchmark_train_step()
        train_dev["train_sec_per_epoch_batch10k"] = sec_e
        train_dev["train_samples_per_sec_device_batch10k"] = sps
        NF_b = PWQuadManager(n_flow=2, seed=2)
        NF_b.create_model(2, 4, [3] * 3)
        NF_b._train_variance_forward_seq(
            camel, optimizers.adamax(2e-3, 1e-4), log=False,
            batch_size=1_000_000, epochs=6, pretty_progressbar=False,
            mini_batch_size=1_000_000, integrate=False, preburn_time=0,
            epochs_per_sync=6)
        sec_e, sps = NF_b.benchmark_train_step(reps=3)
        train_dev["train_sec_per_epoch_batch1m"] = sec_e
        train_dev["train_samples_per_sec_device_batch1m"] = sps
    except Exception as e:
        print(f"# train device metric unavailable: {e}")

    # fused-training-kernel trainer (r4, ops/pwquad_train.py): the opt-in
    # bn_stats="stale" path runs forward+backward in hand-written Pallas
    # kernels on TPU (frozen-stats jnp fallback elsewhere) — VERDICT r3
    # item 3's bar is >= 4e8 samples/s @1M camel
    if on_tpu:
        try:
            NF_s = PWQuadManager(n_flow=2, seed=3)
            NF_s.create_model(2, 4, [3] * 3)
            NF_s._train_variance_forward_seq(
                camel, optimizers.adamax(2e-3, 1e-4), log=False,
                batch_size=1_000_000, epochs=6, pretty_progressbar=False,
                mini_batch_size=1_000_000, integrate=False, preburn_time=0,
                epochs_per_sync=6, bn_stats="stale")
            sec_e, sps = NF_s.benchmark_train_step(reps=3)
            train_dev["train_sec_per_epoch_batch1m_stale_kernel"] = sec_e
            train_dev["train_samples_per_sec_device_batch1m_stale_kernel"] = sps
        except Exception as e:
            print(f"# stale train-kernel metric unavailable: {e}")
        try:
            # flagship 10-D trainer through the fused kernel (XLA batch-BN
            # baseline was 5.2e6/s; docs/TRAIN_KERNEL.md predicts ~3-4e7/s)
            flat10_f = lambda x: jnp.ones(x.shape[0], x.dtype)
            NF_f = PWQuadManager(n_flow=10, seed=4)
            NF_f.create_model(8, 8, [16, 16])
            NF_f._train_variance_forward_seq(
                flat10_f, optimizers.adamax(2e-3, 1e-4), log=False,
                batch_size=1 << 20, epochs=6, pretty_progressbar=False,
                mini_batch_size=1 << 18, integrate=False, preburn_time=0,
                epochs_per_sync=6, bn_stats="stale")
            sec_e, sps = NF_f.benchmark_train_step(reps=3)
            train_dev["train_samples_per_sec_device_flagship_stale"] = sps
        except Exception as e:
            print(f"# flagship stale train-kernel metric unavailable: {e}")
        try:
            # the flagship TRAINING recommendation: final_rank=4 cuts the
            # backward's per-param dW cost ~3.6x (docs/TRAIN_KERNEL.md;
            # measured 2.53e7/s vs 1.0e7/s dense, 4.9x the XLA trainer)
            flat10_r = lambda x: jnp.ones(x.shape[0], x.dtype)
            NF_fr = PWQuadManager(n_flow=10, seed=4)
            NF_fr.create_model(8, 8, [16, 16], final_rank=4)
            NF_fr._train_variance_forward_seq(
                flat10_r, optimizers.adamax(2e-3, 1e-4), log=False,
                batch_size=1 << 20, epochs=6, pretty_progressbar=False,
                mini_batch_size=1 << 18, integrate=False, preburn_time=0,
                epochs_per_sync=6, bn_stats="stale")
            sec_e, sps = NF_fr.benchmark_train_step(reps=3)
            train_dev["train_samples_per_sec_device_flagship_stale_rank4"] = sps
        except Exception as e:
            print(f"# flagship rank4 stale train-kernel metric unavailable: {e}")

    ps_sps = 0.0
    try:
        from nf_tpu.phasespace import FlatInvertiblePhasespace
        gen = FlatInvertiblePhasespace([0.0, 0.0], [173.0, 4.7, 0.0, 80.4])
        n_ps = 1 << 20

        @jax.jit
        def ps_run(key):
            rv = jax.random.uniform(key, (n_ps, gen.nDimPhaseSpace()),
                                    dtype=jnp.float32)
            return gen.generateKinematics_batch(
                1000.0, rv, pT_mincut=20.0, delR_mincut=0.4, rap_maxcut=2.4)

        ps_sps = n_ps / time_sampler(ps_run, jax.random.PRNGKey(1), reps=10)
    except Exception as e:
        print(f"# phase-space bench unavailable: {e}")

    print(json.dumps({
        "metric": "camel2d_flow_samples_per_sec_per_chip",
        "value": endpoint_sps,
        "unit": "samples/s",
        "vs_baseline": endpoint_sps / 1e7,
        "extra": {
            "endpoint_sample_samples_per_sec": endpoint_sps,
            "endpoint_sample_samples_per_sec_2m": endpoint_sps_2m,
            "endpoint_integrate_samples_per_sec": integrate_sps,
            "endpoint_integrate_samples_per_sec_production": integrate_sps_p,
            "integrate_vs_sample_ratio": integrate_sps_p / max(endpoint_sps,
                                                               1e-9),
            "pallas_samples_per_sec": pallas_sps,
            "pallas_device_samples_per_sec": pallas_device_sps,
            "flagship10d_device_samples_per_sec": flagship_device_sps,
            "flagship10d_rank4_device_samples_per_sec":
                flagship_r4_device_sps,
            "flagship10d_rank4_exact_vs_jnp": flagship_r4_exact,
            "kernel_roofline": kernel_roofline,
            **train_dev,
            "xla_samples_per_sec": xla_sps,
            "xla_folded_samples_per_sec": xla_folded_sps,
            "xla_folded_device_samples_per_sec": xla_folded_device_sps,
            "flagship10d_pallas_samples_per_sec": flagship_sps,
            "phase_space_2to4_events_per_sec": ps_sps,
            "kernel_exact_vs_jnp": kernel_exact,
            "camel2d_integral": sig,
            "camel2d_integral_err": sig_err,
            "camel2d_exact": exact,
            "camel2d_rel_err": rel_err,
            "camel2d_qmc_integral": sig_qmc,
            "camel2d_qmc_err": err_qmc,
            "camel2d_qmc_rel_err": rel_err_qmc,
            "camel2d_unweighting_efficiency": unweighting_eff,
            "neval": neval, "nitn": nitn,
            # warm = per-run training cost (compiles cached).  The cold
            # wall-clock is dominated by this environment's shared
            # remote-compile service, whose latency is load-dependent
            # (measured 60 s to 1020 s for identical graphs) — report it
            # separately so the training metric stays reproducible.
            "train_seconds": train_time_warm,
            "train_seconds_cold_incl_remote_compiles": train_time,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never exit without a JSON record
        print(json.dumps({
            "metric": "camel2d_flow_samples_per_sec_per_chip",
            "value": 0.0, "unit": "samples/s", "vs_baseline": 0.0,
            "extra": {"error": f"{type(e).__name__}: {e}"},
        }))
        raise SystemExit(1)
