"""Vmapped ensemble training (nf_tpu.training.ensemble): many flows in one
jit — the TPU-native replacement for the reference's multiprocessing sweep
fan-out (reference experiment_mg.py:85-87)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf_tpu.flows import factory, model as fmodel
from nf_tpu.training import optimizers
from nf_tpu.training.ensemble import stack_ensemble, train_ensemble, run_index


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def camel_exact():
    g = 0.2 * (math.sqrt(math.pi) / 2) * (math.erf(0.25 / 0.2) + math.erf(0.75 / 0.2))
    return 2 * g * g


def _ensemble(n_runs=4):
    def init(k):
        return factory.build_pwquad_flow(k, 2, 4, 4, (4, 4), jnp.float64)
    return stack_ensemble(init, jax.random.PRNGKey(0), n_runs)


def test_ensemble_trains_all_runs():
    flow, p_stack, s_stack = _ensemble(4)
    opt = optimizers.adamax(3e-3)
    res = train_ensemble(flow, p_stack, s_stack, camel, opt,
                         jax.random.PRNGKey(1), batch_size=1500, epochs=30,
                         preburn_time=3, kill_counter=100)
    assert res["history"].shape == (4, 30)
    assert res["best_params"] is not None
    # every run improved on its phase-A loss
    assert (np.asarray(res["best_loss"]) < res["int_loss"]).all()
    # per-run integral estimates are near the analytic camel value
    exact = camel_exact()
    for i in range(4):
        assert abs(res["integ_tot"][i] - exact) < \
            8 * res["err_tot"][i] + 0.05 * exact

    # per-run best snapshots are usable flows mapping onto [0, 1]
    bp = run_index(res["best_params"], 2)
    bs = run_index(res["best_bn"], 2)
    w = jax.random.uniform(jax.random.PRNGKey(5), (256, 2), jnp.float64)
    x, jac, _ = fmodel.forward(flow, bp, bs, w, False)
    assert bool(((x >= 0) & (x <= 1)).all())
    assert bool(jnp.isfinite(jac).all())


def test_ensemble_runs_differ_and_are_deterministic():
    flow, p_stack, s_stack = _ensemble(3)
    opt = optimizers.adamax(3e-3)
    kw = dict(batch_size=800, epochs=10, preburn_time=0, kill_counter=100)
    r1 = train_ensemble(flow, p_stack, s_stack, camel, opt,
                        jax.random.PRNGKey(2), **kw)
    r2 = train_ensemble(flow, p_stack, s_stack, camel, opt,
                        jax.random.PRNGKey(2), **kw)
    np.testing.assert_array_equal(r1["history"], r2["history"])
    # distinct seeds/streams -> distinct trajectories
    assert not np.allclose(r1["history"][0], r1["history"][1])


def test_ensemble_kill_counter_freezes_best():
    """lr=0 makes the loss a random walk: runs hit the kill counter; their
    best snapshot must come from before the kill (freeze semantics)."""
    flow, p_stack, s_stack = _ensemble(3)
    opt = optimizers.adamax(0.0)
    res = train_ensemble(flow, p_stack, s_stack, camel, opt,
                         jax.random.PRNGKey(3), batch_size=500, epochs=60,
                         preburn_time=0, kill_counter=2)
    assert np.asarray(res["killed"]).all()
    assert np.isfinite(res["integ_tot"]).all()


def test_ensemble_requires_shared_plan():
    import pytest
    sizes = iter([2, 3])

    def init(k):
        return factory.build_pwquad_flow(k, 2, next(sizes), 4, (4,),
                                         jnp.float64)
    with pytest.raises(ValueError):
        stack_ensemble(init, jax.random.PRNGKey(0), 2)


@pytest.mark.slow
def test_ensemble_grouping_matches_single_call():
    """runs_per_call grouping must not change results (same per-run keys)."""
    flow, p_stack, s_stack = _ensemble(5)
    opt = optimizers.adamax(3e-3)
    kw = dict(batch_size=600, epochs=8, preburn_time=0, kill_counter=100)
    r_all = train_ensemble(flow, p_stack, s_stack, camel, opt,
                           jax.random.PRNGKey(6), runs_per_call=None, **kw)
    r_grp = train_ensemble(flow, p_stack, s_stack, camel, opt,
                           jax.random.PRNGKey(6), runs_per_call=2, **kw)
    np.testing.assert_allclose(r_grp["history"], r_all["history"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r_grp["best_loss"]),
                               np.asarray(r_all["best_loss"]), rtol=1e-12)


def test_auto_group_size():
    """runs_per_call='auto' derives the group size from the memory estimate
    and the measured runtime ceilings (probe table in
    docs/ENSEMBLE_CEILING.md)."""
    from nf_tpu.training.ensemble import (auto_runs_per_call,
                                          estimate_run_bytes,
                                          MAX_RUNS_PER_CALL,
                                          MAX_SAMPLE_ROWS_PER_CALL)
    flow, p_stack, s_stack = _ensemble(2)
    p0, s0 = run_index(p_stack, 0), run_index(s_stack, 0)

    per_run = estimate_run_bytes(flow, p0, s0, 10000, 1, 50)
    assert per_run > 0

    # the measured binding limit is vmap WIDTH (256 runs unusable,
    # 128 ok): a 512-run request with tiny batches must cap at the
    # width ceiling regardless of memory/rows
    g_wide = auto_runs_per_call(flow, p0, s0, 100, 1, 10, 512)
    assert g_wide == MAX_RUNS_PER_CALL
    # the rows guard still applies as a secondary cap
    g = auto_runs_per_call(flow, p0, s0, MAX_SAMPLE_ROWS_PER_CALL // 2,
                           1, 50, 8)
    assert g <= 2
    # tiny batches, few runs: no limit binds, use all runs
    g_small = auto_runs_per_call(flow, p0, s0, 100, 1, 10, 8)
    assert g_small == 8


@pytest.mark.slow
def test_ensemble_auto_grouping_completes_64_runs():
    """A 64-run sweep completes via automatic grouping with the chosen
    group size reported (VERDICT r2 item 6 'Done' criterion; tiny epochs
    keep the CPU cost low — the TPU-scale version is exercised in
    tools/ensemble_stress.py)."""
    flow, p_stack, s_stack = _ensemble(64)
    opt = optimizers.adamax(3e-3)
    res = train_ensemble(flow, p_stack, s_stack, camel, opt,
                         jax.random.PRNGKey(5), batch_size=6000, epochs=2,
                         preburn_time=0, kill_counter=100)
    assert res["history"].shape == (64, 2)
    assert res["group_size"] >= 1
    from nf_tpu.training.ensemble import (MAX_RUNS_PER_CALL,
                                          MAX_SAMPLE_ROWS_PER_CALL)
    assert res["group_size"] <= MAX_RUNS_PER_CALL
    assert res["group_size"] * 6000 <= MAX_SAMPLE_ROWS_PER_CALL
    assert np.isfinite(np.asarray(res["best_loss"])).all()


@pytest.mark.slow
def test_adaptive_group_fallback(monkeypatch):
    """A group whose device program dies is retried at half the width; the
    sweep completes with identical results and reports the reduced final
    group size (VERDICT r3 weak #4: the ceiling constant is a starting
    point, not a load-bearing guarantee)."""
    from nf_tpu.training import ensemble as ens

    flow, p_stack, s_stack = _ensemble(6)
    opt = optimizers.adamax(3e-3)
    kw = dict(batch_size=600, epochs=6, preburn_time=0, kill_counter=100)

    ref = train_ensemble(flow, p_stack, s_stack, camel, opt,
                         jax.random.PRNGKey(6), runs_per_call=None, **kw)

    # any group wider than 2 "faults": 6 -> 3 -> (retry) 1? no: 6//2=3,
    # 3 > 2 so 3//2=1... widths tried: 6, 3, 1 -> final group size 1
    monkeypatch.setattr(ens, "_TEST_FAULT_WIDTH", 2)
    res = train_ensemble(flow, p_stack, s_stack, camel, opt,
                         jax.random.PRNGKey(6), runs_per_call=None, **kw)
    assert res["group_size"] <= 2
    np.testing.assert_allclose(res["history"], ref["history"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res["best_loss"]),
                               np.asarray(ref["best_loss"]), rtol=1e-12)

    # a fault at width 1 is not a width problem: re-raises
    monkeypatch.setattr(ens, "_TEST_FAULT_WIDTH", 0)
    with pytest.raises(RuntimeError, match="injected"):
        train_ensemble(flow, p_stack, s_stack, camel, opt,
                       jax.random.PRNGKey(6), runs_per_call=None, **kw)
