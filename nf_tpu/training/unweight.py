"""Unweighted event generation from a trained flow.

The reference only *measures* unweighting efficiency (w_mean/w_max,
reference experiment_mg.py:101); this module performs the actual
accept-reject unweighting, the production endpoint of neural importance
sampling for event generation.

Fully jittable: a fixed-size proposal batch is drawn through the flow, the
weights w = f(x)*jac are compared against ``w_max * u``, and accepted events
are compacted.  Over-weight events (w > w_max) are retained with weight
clipping and counted, matching standard practice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nf_tpu.flows import model as fmodel


def _make_draw(flow, params, state, n, train, method):
    """Proposal sampler ``draw(key) -> (x, jac)``; ``method=None`` keeps the
    stateful forward, 'auto'/'fused'/'folded' use nf_tpu.flows.sampling
    (the fused Pallas kernel on TPU — the production throughput path)."""
    if method is None:
        def draw(k):
            w = jax.random.uniform(k, (n, flow.n_flow))
            x, jacv, _ = fmodel.forward(flow, params, state, w, train)
            return x, jacv
        return draw
    from nf_tpu.flows import sampling as fsampling
    return fsampling.make_sampler(flow, params, state, n, method=method,
                                  train=train, jit=False)


def estimate_wmax(flow, params, state, f, key, n=100_000, train=False,
                  safety=1.0, quantile=1.0, method=None):
    """Estimate the reference maximum weight over ``n`` fresh samples.

    ``quantile < 1`` uses that weight quantile instead of the strict max —
    standard practice for heavy-tailed weight distributions, where a single
    spike would crater the acceptance rate; the few over-weight events are
    kept and counted by the unweighter.
    """
    x, jacv = _make_draw(flow, params, state, n, train, method)(key)
    weights = f(x) * jacv
    if quantile >= 1.0:
        ref = jnp.max(weights)
    else:
        ref = jnp.quantile(weights, quantile)
    return float(ref) * safety


def unweighted_batch(flow, params, state, f, key, n_proposals, w_max,
                     train=False, draw=None, return_weights=False):
    """One accept-reject pass.

    Returns ``(x, accept_mask, n_overweight)``: proposals ``x``
    [n_proposals, n_flow], a boolean acceptance mask, and the count of
    over-weight events (accepted unconditionally; increase ``w_max`` if
    this is a meaningful fraction).  With ``return_weights=True`` a fourth
    element carries the partial-unweighting event weights
    ``max(1, w/w_max)`` (see :func:`generate_unweighted`).
    """
    k_w, k_u = jax.random.split(key)
    if draw is None:
        draw = _make_draw(flow, params, state, n_proposals, train, None)
    x, jacv = draw(k_w)
    weights = f(x) * jacv
    u = jax.random.uniform(k_u, (n_proposals,), dtype=weights.dtype)
    accept = weights > u * w_max
    n_over = jnp.sum(weights > w_max)
    if return_weights:
        return x, accept, n_over, jnp.maximum(1.0, weights / w_max)
    return x, accept, n_over


def generate_unweighted(flow, params, state, f, key, n_events, w_max=None,
                        train=False, batch=1 << 17, max_batches=1000,
                        wmax_quantile=1.0, method="auto", mesh=None,
                        partial_unweight=False, compact="auto"):
    """Generate at least ``n_events`` unweighted events (host-driven loop).

    Returns ``(events [>=n_events, n_flow], efficiency, n_overweight)``.
    Stops after ``max_batches`` proposal batches even if short.
    ``method="auto"`` draws proposals through the fused Pallas kernel on
    TPU (eval-mode map) and the stateful forward elsewhere; pass ``None``
    to force the stateful reference-parity path.

    ``partial_unweight=True`` switches to PARTIAL unweighting
    (MadGraph/MadNIS practice): events are still accepted with probability
    ``min(1, w/w_max)``, but each accepted event carries the weight
    ``max(1, w/w_max)`` instead of 1 — the weighted accepted sample is
    then EXACTLY f-distributed at ANY ``wmax_quantile`` (the plain mode's
    overweight truncation bias disappears; only the weight spread
    changes).  The return becomes ``(events, weights, info)`` with
    ``info = {"eff", "accept_rate", "n_overweight", "w_max"}`` where
    ``eff`` is the Kish effective efficiency
    ``(sum w)^2 / sum w^2 / n_proposals`` — it interpolates from the
    standard unweighting efficiency (quantile 1) up toward the weighted
    ESS fraction as the quantile drops.

    ``mesh`` shards the proposal draw over the mesh's 'dp' axis
    (parallel.sampling.make_dp_sampler); the weight/accept computation
    consumes the sharded arrays inside the same jit, so XLA keeps f and
    the comparison distributed too.

    ``compact`` gathers the ACCEPTED rows on device (``jnp.nonzero`` with
    a static capacity sized from the first batch's observed accept rate)
    so only accepted events cross the device->host boundary — at accept
    rate a the transfer shrinks ~1/a, which dominates end-to-end
    unweighted-events/s whenever the device link is the bottleneck
    (as on this tunnel-attached TPU; see bench.py's unweight stage).
    Exact: the
    kept set equals the uncompacted accepted set, except that a batch
    whose accepts overflow the 1.5x-safety capacity drops the surplus
    rows (the accepted rows of a batch are exchangeable — iid proposals —
    so keeping the first-capacity subset leaves the kept sample exactly
    f-distributed; the dropped rows are counted against efficiency
    conservatively, and the capacity is doubled for subsequent batches).
    ``"auto"`` enables it off-mesh (sharded arrays would pay a
    cross-device gather); an int forces that initial capacity (testing /
    known accept rates).
    """
    import numpy as np

    if method == "auto":
        from nf_tpu.flows.sampling import supported_by_kernel
        method = "fused" if (not train and jax.default_backend() == "tpu"
                             and supported_by_kernel(flow)) else None

    if mesh is not None:
        from nf_tpu.parallel.sampling import make_dp_sampler
        sharded = make_dp_sampler(flow, params, state, mesh, batch,
                                  method=method or "folded")

        def draw_mesh(k):
            return sharded(k)
    else:
        draw_mesh = None

    if w_max is None:
        key, sub = jax.random.split(key)
        if draw_mesh is not None:
            x, jacv = draw_mesh(sub)
            weights = f(x) * jacv
            ref = jnp.max(weights) if wmax_quantile >= 1.0 \
                else jnp.quantile(weights, wmax_quantile)
            w_max = float(ref) * 1.05
        else:
            w_max = estimate_wmax(flow, params, state, f, sub, safety=1.05,
                                  quantile=wmax_quantile, method=method)

    if compact == "auto":
        compact = mesh is None
    draw = draw_mesh if draw_mesh is not None \
        else _make_draw(flow, params, state, batch, train, method)
    # w_max is passed at CALL time (a traced operand), never closed over:
    # it changes run-to-run (pilot-dependent), and baking it in would
    # make every generate_unweighted call compile a brand-new program.
    step = jax.jit(partial(unweighted_batch, flow, params, state, f,
                           n_proposals=batch, train=train,
                           draw=draw, return_weights=partial_unweight))

    def make_compact_step(capacity):
        # jnp.nonzero(size=) keeps the FIRST `capacity` accepted indices
        # (padded with 0 — the host slices [:k] so the pads never leak);
        # the device->host transfer is `capacity` rows instead of `batch`.
        def _step(sub, wm):
            if partial_unweight:
                x, accept, over, wtilde = unweighted_batch(
                    flow, params, state, f, sub, n_proposals=batch,
                    w_max=wm, train=train, draw=draw,
                    return_weights=True)
            else:
                x, accept, over = unweighted_batch(
                    flow, params, state, f, sub, n_proposals=batch,
                    w_max=wm, train=train, draw=draw)
                wtilde = None
            n_true = jnp.sum(accept)
            idx = jnp.nonzero(accept, size=capacity, fill_value=0)[0]
            k = jnp.minimum(n_true, capacity)
            wc = wtilde[idx] if partial_unweight else jnp.zeros((capacity,))
            return x[idx], wc, k, n_true, over
        return jax.jit(_step)

    out, out_w, n_acc, n_prop, n_over = [], [], 0, 0, 0
    cstep, capacity = None, None
    if isinstance(compact, int) and not isinstance(compact, bool):
        capacity = int(min(max(compact, 1), batch))
        cstep, compact = make_compact_step(capacity), True
    for i in range(max_batches):
        key, sub = jax.random.split(key)
        if cstep is not None:
            xc, wc, k, n_true, over = cstep(sub, jnp.asarray(w_max))
            k = int(k)
            out.append(np.asarray(xc)[:k])
            if partial_unweight:
                out_w.append(np.asarray(wc)[:k])
            n_acc += k
            n_prop += batch
            n_over += int(over)
            if int(n_true) > capacity:  # overflow: surplus dropped, grow
                capacity = min(2 * capacity, batch)
                cstep = make_compact_step(capacity)
            if n_acc >= n_events:
                break
            continue
        if partial_unweight:
            x, accept, over, wtilde = step(sub, w_max=jnp.asarray(w_max))
        else:
            x, accept, over = step(sub, w_max=jnp.asarray(w_max))
        acc_np = np.asarray(accept)
        out.append(np.asarray(x)[acc_np])
        if partial_unweight:
            out_w.append(np.asarray(wtilde)[acc_np])
        n_acc += int(acc_np.sum())
        n_prop += batch
        n_over += int(over)
        if n_acc >= n_events:
            break
        if compact and i == 0:
            # Size the gather capacity from the observed accept rate with
            # 1.5x headroom (min 1024 rows so a zero/low first batch does
            # not pin the capacity at a recompile-thrashing size).
            rate = max(n_acc / max(n_prop, 1), 1.0 / batch)
            capacity = int(min(max(1024, 1.5 * rate * batch), batch))
            cstep = make_compact_step(capacity)
    events = np.concatenate(out, axis=0)
    if partial_unweight:
        w_all = np.concatenate(out_w, axis=0)
        kish = float(w_all.sum()) ** 2 / max(float((w_all ** 2).sum()), 1e-300)
        info = {"eff": kish / max(n_prop, 1),
                "accept_rate": n_acc / max(n_prop, 1),
                "n_overweight": n_over, "w_max": float(w_max)}
        return events, w_all, info
    return events, n_acc / max(n_prop, 1), n_over
