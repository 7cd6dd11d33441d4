"""Vmapped ensemble training: many flows, one jit, one chip.

The reference parallelizes sweeps by forking OS processes, one eager torch
run each (reference experiment_mg.py:85-87).  The TPU-native equivalent
batches the *runs themselves*: per-run parameters are stacked along a
leading axis and the entire training program — phase-A estimate, preburn,
variance-loss epochs, kill-counter / preburn-exit state machine, best-model
tracking — runs under ``jax.vmap`` inside a single ``lax.scan`` over
epochs.  A 64-seed sweep costs one compile and one device program instead
of 64 sequential runs.

Semantics: the per-run state machine is the on-device replica used by the
manager's chunked path (BasicManager._train_variance_forward_seq,
reference manager.py:307-327), with one difference — runs that hit the
kill counter keep executing (a vmapped program is fixed-shape) but their
best-model snapshot and integral accumulators FREEZE at the kill point,
which is observationally equivalent to stopping.  The host-side stale
check (manager.py:317-321) is not applied; every run gets the full epoch
budget unless killed.

Typical use: seed/width sweeps of the same architecture (one static
``Flow``, stacked params).  Different architectures still need separate
compiles — use utils.sweep for those.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Measured per-dispatch limits for this class of vmapped training
# programs, bisected on the live v5e runtime with
# tools/probe_ensemble_ceiling.py (r5 run, table in
# docs/ENSEMBLE_CEILING.md).  The probe varies each candidate limit with
# the others held fixed; the verdicts:
#
#   * sample rows are NOT binding — 640k rows (the r2 fault config,
#     64 x 10000) and 1.28M rows (both as 128 x 10000 and as one
#     1.28M-row batch) all complete cleanly on the current runtime;
#   * scan depth is NOT binding (32 epochs at 320k rows ok);
#   * vmap WIDTH is the measured boundary: 128 runs complete, 256 runs
#     never return within 900 s (a 4-epoch toy program) — whether the
#     hang is compile blowup or a runtime stall, width > 128 is unusable.
#
# History: the r2 "640k rows" fault that motivated the original
# 320k-row guard did not reproduce — that ceiling was either transient or
# runtime-version-specific.  The r4 multi-channel instance (one dispatch
# containing a 300-epoch x 8-minibatch scan, ~2.5e9 total rows) remains
# the evidence for a total program-duration limit, which epochs_per_call
# chunking addresses on that path.
#
# These constants are starting points, not safety guarantees:
# train_ensemble retries any group whose device program dies with
# progressively halved group sizes (_ADAPTIVE fallback below), so an
# environment with a different ceiling converges to a working size
# instead of faulting permanently.  Re-bisect a new runtime with the
# probe tool.
MAX_RUNS_PER_CALL = 128          # measured: 128 ok, 256 unusable
MAX_SAMPLE_ROWS_PER_CALL = 1_280_000  # largest probed-ok row count

# Exception types treated as "the device program / runtime died" and worth
# retrying at a smaller group size.  Anything else (shape errors, user f
# bugs) re-raises immediately.
_RETRYABLE = (RuntimeError,)
try:  # jaxlib's runtime error subclass (covers remote-worker termination)
    from jax.errors import JaxRuntimeError as _JRE
    _RETRYABLE = (_JRE, RuntimeError)
except Exception:  # pragma: no cover - older jaxlib layouts
    pass

# Test hook: when set, any group wider than this raises RuntimeError before
# dispatch, letting the suite exercise the adaptive-halving path without a
# real runtime fault (tests/test_ensemble.py::test_adaptive_group_fallback).
_TEST_FAULT_WIDTH = None


def _tree_bytes(tree):
    return sum(np.prod(l.shape) * l.dtype.itemsize
               for l in jax.tree.leaves(tree))


def estimate_run_bytes(flow, params, bn_state, mini_batch_size,
                       n_minibatches, epochs, dtype=jnp.float32):
    """Rough live-memory estimate (bytes) for ONE ensemble run.

    Components: params (live + best snapshot + 2x Adamax slots + the
    per-minibatch gradient stack emitted by the inner scan), BatchNorm
    state (live + snapshot), the 5 scalar per-epoch scan outputs, and the
    dominant transient — forward activations retained for the backward
    pass, ~(sum of conditioner widths + a few per-dim temporaries) floats
    per sample.  Order-of-magnitude is all the auto-sizer needs.
    """
    p_bytes = _tree_bytes(params)
    b_bytes = _tree_bytes(bn_state)
    itemsize = jnp.dtype(dtype).itemsize
    act_per_sample = 0
    for cfg in flow.cells:
        act_per_sample += sum(cfg.nn_sizes) + 6 * flow.n_flow
    act_bytes = 3 * mini_batch_size * act_per_sample * itemsize
    return (p_bytes * (2 + 2 + n_minibatches) + 2 * b_bytes
            + 5 * epochs * itemsize + act_bytes)


def auto_runs_per_call(flow, params, bn_state, mini_batch_size,
                       n_minibatches, epochs, n_runs, dtype=jnp.float32,
                       hbm_budget_bytes=None):
    """Derive the vmapped group size from the device memory budget AND the
    measured runtime ceilings (MAX_RUNS_PER_CALL, the binding one, plus
    MAX_SAMPLE_ROWS_PER_CALL as the largest probed-ok row count)."""
    if hbm_budget_bytes is None:
        stats = {}
        try:
            stats = jax.devices()[0].memory_stats() or {}
        except Exception:
            pass
        limit = stats.get("bytes_limit", 16 * 1024 ** 3)
        hbm_budget_bytes = int(0.4 * limit)
    per_run = estimate_run_bytes(flow, params, bn_state, mini_batch_size,
                                 n_minibatches, epochs, dtype)
    by_mem = max(int(hbm_budget_bytes // max(per_run, 1)), 1)
    by_rows = max(MAX_SAMPLE_ROWS_PER_CALL // max(mini_batch_size, 1), 1)
    return max(min(by_mem, by_rows, MAX_RUNS_PER_CALL, n_runs), 1)


def stack_ensemble(init_fn, key, n_runs):
    """Stack per-run (params, state) pytrees along a leading run axis.

    ``init_fn(key) -> (flow, params, state)``; the flow (static plan) must
    be identical across runs — only the initialization key varies.
    """
    keys = jax.random.split(key, n_runs)
    flows, ps, ss = zip(*(init_fn(k) for k in keys))
    if any(f != flows[0] for f in flows[1:]):
        raise ValueError("ensemble runs must share one static Flow plan")
    stack = lambda *xs: jnp.stack(xs)  # noqa: E731
    return flows[0], jax.tree.map(stack, *ps), jax.tree.map(stack, *ss)


def train_ensemble(flow, params_stack, bn_stack, f, optimizer, key,
                   batch_size=1000, epochs=50, mini_batch_size=None,
                   preburn_time=0, kill_counter=7, loss_mode="var",
                   select_best_by="loss", pathwise=False, dtype=None,
                   runs_per_call="auto", verbose=False):
    """Train ``n_runs`` flows simultaneously; returns a result dict.

    ``params_stack``/``bn_stack``: pytrees with a leading run axis (from
    :func:`stack_ensemble`).  ``f`` is shared by all runs (vmapped over the
    per-run sample batch).  Per-run PRNG streams are disjoint folds of
    ``key``.

    Returns dict with (all leading-axis ``n_runs`` unless noted):
      ``best_params``/``best_bn`` — best snapshots; ``best_loss``;
      ``best_epoch``; ``killed``; ``history [n_runs, epochs]``;
      ``integ_tot``/``err_tot`` — per-run inverse-variance combinations
      (reference manager.py:349-350); ``int_loss`` — phase-A losses.

    ``runs_per_call`` bounds how many runs execute in one device program
    (groups are looped on host and results re-stacked).  ``"auto"``
    (default) derives the group size from a per-run live-memory estimate
    (:func:`estimate_run_bytes`) against ~40% of the device HBM, capped by
    the empirical runtime-stability ceiling
    (:data:`MAX_SAMPLE_ROWS_PER_CALL` — very wide vmapped ensembles fault
    the remote-TPU runtime well below the memory bound; signature
    documented there).  An int forces a size; ``None`` disables grouping.
    Whatever the starting size, a group whose device program dies with a
    runtime error is retried at half the width (and all remaining groups
    inherit the reduced size), so a wrong initial guess degrades to extra
    compiles, not a failed sweep.  The result dict reports the FINAL
    ``group_size`` actually used.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if mini_batch_size is None:
        mini_batch_size = batch_size
    mini_batch_size = min(mini_batch_size, batch_size)
    n_minibatches = batch_size // mini_batch_size
    n_flow = flow.n_flow
    n_runs = jax.tree.leaves(params_stack)[0].shape[0]
    by_ess = select_best_by == "ess"

    from nf_tpu.flows import model as fmodel

    def _var(x):
        return jnp.var(x, ddof=1)

    # ---- per-run phase A (reference manager.py:139-167)
    def phase_a_one(key):
        def round_fn(carry, k):
            maxf, best_loss, integ0, err0 = carry
            w = jax.random.uniform(k, (2 * mini_batch_size, n_flow), dtype)
            fres = f(w)
            integ0 += jnp.sum(fres) / (n_flow * 2 * mini_batch_size)
            err0 += _var(fres) / n_flow
            maxf = jnp.maximum(maxf, jnp.max(fres))
            if loss_mode == "var":
                best_loss += _var(fres / maxf) / n_flow
            else:
                best_loss += jnp.mean(fres ** 2) / n_flow
            return (maxf, best_loss, integ0, err0), None
        init = tuple(jnp.zeros((), dtype) for _ in range(4))
        keys = jax.random.split(key, n_flow)
        (maxf, best_loss, integ0, err0), _ = jax.lax.scan(round_fn, init, keys)
        return maxf, best_loss, integ0, err0

    # ---- per-run epoch body (matches the manager's, manager.py:212-280)
    def make_epoch_body(preburn: bool):
        def epoch_step(params, bn_state, opt_state, maxf, key):
            def minibatch(bn_carry, k):
                w = jax.random.uniform(k, (mini_batch_size, n_flow), dtype)

                def loss_fn(p):
                    x, jacv, new_bn = fmodel.forward(flow, p, bn_carry, w, True)
                    if preburn:
                        fres = f(w)
                        fXJ = fres * jacv / maxf
                    else:
                        x_f = x if pathwise else jax.lax.stop_gradient(x)
                        fres = f(x_f) * jacv
                        fXJ = fres / maxf
                    if loss_mode == "var" or (loss_mode == "kl" and preburn):
                        l = _var(fXJ)
                    elif loss_mode == "kl":
                        l = jnp.mean(jax.lax.stop_gradient(fXJ)
                                     * jnp.log(jnp.maximum(jacv, 1e-30)))
                    else:
                        l = jnp.mean((fXJ * maxf) ** 2)
                    fres_d = jax.lax.stop_gradient(fres)
                    return l, (new_bn, jnp.mean(fres_d), _var(fres_d),
                               jnp.mean(fres_d ** 2))

                (l, (new_bn, ii, ei, qi)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                return new_bn, (l, g, ii, ei, qi)

            keys = jax.random.split(key, n_minibatches)
            bn_state, (ls, gs, iis, eis, qis) = jax.lax.scan(
                minibatch, bn_state, keys)
            loss = jnp.mean(ls)
            grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), gs)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            mean_w = jnp.mean(iis)
            ess = mean_w ** 2 / jnp.maximum(jnp.mean(qis), 1e-300)
            return params, bn_state, opt_state, loss, mean_w, jnp.mean(eis), ess
        return epoch_step

    body_pre = make_epoch_body(True)
    body_norm = make_epoch_body(False)

    # ---- per-run epoch + state machine (device replica of the manager's
    # chunked machine; see manager.py chunk_step)
    def machine_epoch(carry, xs):
        (params, bn, opt, maxf, int_loss, b_metric, b_pb, pre, counter,
         last_loss, killed) = carry
        ek, i_g = xs
        params, bn, opt, loss, integ_e, err_e, ess = jax.lax.cond(
            pre, body_pre, body_norm, params, bn, opt, maxf, ek)
        improved = jnp.logical_and(
            jnp.logical_and(~pre, ~killed),
            (ess > b_metric) if by_ess else (loss < b_metric))
        b_metric = jnp.where(improved, ess if by_ess else loss, b_metric)
        b_pb = jax.tree.map(lambda old, new: jnp.where(improved, new, old),
                            b_pb, (params, bn))
        counter = jnp.where(loss < last_loss, 0, counter + 1)
        overflow = counter > kill_counter
        end_pre_kill = jnp.logical_and(overflow, pre)
        killed = jnp.logical_or(killed, jnp.logical_and(overflow, ~pre))
        counter = jnp.where(end_pre_kill, 0, counter)
        pre = jnp.logical_and(pre, ~end_pre_kill)
        last_loss = loss
        pre = jnp.logical_and(
            pre, ~jnp.logical_or(loss < 0.25 * int_loss, i_g > preburn_time))
        return (params, bn, opt, maxf, int_loss, b_metric, b_pb, pre,
                counter, last_loss, killed), \
            (loss, integ_e, err_e, killed, improved)

    def train_one(params, bn, key):
        k_a, k_t = jax.random.split(key)
        maxf, int_loss, integ0, err0 = phase_a_one(k_a)
        opt_state = optimizer.init(params)
        # manager semantics: best_loss starts at the phase-A loss
        b_metric0 = jnp.asarray(-1.0, dtype) if by_ess \
            else jnp.asarray(int_loss, dtype)
        init = (params, bn, opt_state, maxf, int_loss,
                b_metric0, (params, bn),
                jnp.asarray(preburn_time > 0), jnp.asarray(0, jnp.int32),
                jnp.asarray(1000.0, dtype), jnp.asarray(False))
        keys = jax.random.split(k_t, epochs)
        i_gs = jnp.arange(epochs)
        carry, (losses, integs, errs, killed_series, improved_series) = \
            jax.lax.scan(machine_epoch, init, (keys, i_gs))
        (params, bn, opt_state, maxf, int_loss, b_metric, b_pb, pre,
         counter, last_loss, killed) = carry
        # integral/error accumulators incl. the phase-A entry, with epochs
        # after a kill excluded (the manager stops processing there; the
        # killing epoch itself IS accumulated, so shift the mask by one)
        alive = ~jnp.concatenate(
            [jnp.asarray([False]), killed_series[:-1]])
        integ = jnp.concatenate([integ0[None], jnp.where(alive, integs, 0.0)])
        err = jnp.concatenate([err0[None], jnp.where(alive, errs, 0.0)])
        mask = err > 0
        iw = jnp.where(mask, 1.0 / jnp.where(mask, err, 1.0), 0.0)
        integ_tot = jnp.sum(integ * iw) / jnp.sum(iw)
        err_tot = jnp.sqrt(1.0 / jnp.sum(iw))
        best_epoch = jnp.max(jnp.where(improved_series, i_gs, -1))
        return (b_pb[0], b_pb[1], b_metric, best_epoch, killed, losses,
                integ_tot, err_tot, int_loss)

    run_keys = jax.random.split(key, n_runs)
    step = jax.jit(jax.vmap(train_one))
    if runs_per_call == "auto":
        runs_per_call = auto_runs_per_call(
            flow, run_index(params_stack, 0), run_index(bn_stack, 0),
            mini_batch_size, n_minibatches, epochs, n_runs, dtype)
        if verbose:
            print(f"train_ensemble: auto group size {runs_per_call} "
                  f"({n_runs} runs, mini_batch {mini_batch_size})")
    group_size = n_runs if runs_per_call is None else min(runs_per_call,
                                                          n_runs)

    def run_group(sl):
        if _TEST_FAULT_WIDTH is not None and \
                (sl.stop - sl.start) > _TEST_FAULT_WIDTH:
            raise RuntimeError("injected ensemble fault (test hook)")
        return step(jax.tree.map(lambda a: a[sl], params_stack),
                    jax.tree.map(lambda a: a[sl], bn_stack), run_keys[sl])

    # Adaptive dispatch: if a group's device program dies (remote-runtime
    # fault — see MAX_SAMPLE_ROWS_PER_CALL), halve the group size and
    # retry, lowering the size for all remaining groups too.  A failure at
    # size 1 is not a width problem and re-raises.
    groups = []
    s0, cur = 0, group_size
    while s0 < n_runs:
        sl = slice(s0, min(s0 + cur, n_runs))
        try:
            groups.append(jax.block_until_ready(run_group(sl)))
        except _RETRYABLE as e:
            if cur <= 1:
                raise
            cur = max(cur // 2, 1)
            if verbose:
                print(f"train_ensemble: group of {sl.stop - sl.start} runs "
                      f"failed ({type(e).__name__}); retrying at group size "
                      f"{cur}")
            continue
        s0 = sl.stop
    group_size = cur
    outs = groups[0] if len(groups) == 1 else \
        jax.tree.map(lambda *xs: jnp.concatenate(xs), *groups)
    (best_p, best_bn, best_metric, best_epoch, killed, history,
     integ_tot, err_tot, int_loss) = outs
    return {
        "best_params": best_p,
        "best_bn": best_bn,
        ("best_ess" if by_ess else "best_loss"): best_metric,
        "best_epoch": np.asarray(best_epoch),
        "killed": np.asarray(killed),
        "history": np.asarray(history),
        "integ_tot": np.asarray(integ_tot),
        "err_tot": np.asarray(err_tot),
        "int_loss": np.asarray(int_loss),
        "group_size": group_size,
    }


def run_index(tree, i):
    """Extract run ``i``'s pytree from a stacked ensemble result."""
    return jax.tree.map(lambda a: a[i], tree)
