"""Fused Pallas training kernels for PWQuad flows (design: docs/TRAIN_KERNEL.md).

The XLA training path is ~10-15x off the fused eval kernel on identical
math, and r4 profiling showed the gap is structural (fusion-boundary
materialization), not fixable by relayout or op restructuring.  This module
fuses the flow's forward AND a hand-derived backward into Pallas programs,
for the opt-in stale-statistics BN trainer variant:

  * BN uses fixed (running) statistics inside the step, folded into the
    adjacent Linear weights exactly like the eval kernel
    (`pwquad_sampler._fold_conditioner`), so there is no cross-sample
    coupling anywhere in the backward except the dW reductions (which
    accumulate across grid steps in a revisited output block).
  * The fold is re-expressed in differentiable jnp
    (:func:`fold_cell_jnp`), so `jax.vjp` through the fold maps the
    kernel's folded-weight cotangents back to the raw (W, b, gamma, beta)
    parameters exactly — no hand algebra at that layer.
  * The transform backward is the closed-form VJP derived in
    docs/TRAIN_KERNEL.md (softmax/trapezoid-normalization chain, masked
    prefix selects for the bin-indexed terms); gradient equality against
    jax autodiff of the identical frozen-stats jnp forward
    (:func:`folded_forward_ref`) is pinned by tests/test_train_kernel.py
    in interpret mode.

Scope: all three cell kinds — pwquad, pwlin, and affine — including masked
(gather/scatter) and rolled plans, ``final_rank`` factored conditioners and
both positivity activations; gradient equality vs autodiff is pinned for
every kind in tests/test_train_kernel.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nf_tpu.ops.pwquad_sampler import LANE

TRAIN_SUB = 8  # smaller tile than eval: the backward holds ~4x the registers


# ---------------------------------------------------------------------------
# Differentiable (jnp) parameter folding + frozen-stats reference forward
# ---------------------------------------------------------------------------

def fold_cell_jnp(params, state, eps=1e-5):
    """jnp mirror of pwquad_sampler._fold_conditioner (differentiable).

    Returns a list of (W_eff, b_eff, relu_after).  Gradients w.r.t. the raw
    parameters flow through this fold; the statistics in ``state`` are
    constants (the stale-stats semantics, docs/TRAIN_KERNEL.md).
    """
    def bn_affine(p, s):
        scale = p["scale"] / jnp.sqrt(jax.lax.stop_gradient(s["var"]) + eps)
        shift = p["bias"] - jax.lax.stop_gradient(s["mean"]) * scale
        return scale, shift

    layers = []
    s_in, t_in = bn_affine(params["bn_in"], state["bn_in"])
    for i, lin in enumerate(params["linears"]):
        w = lin["w"]
        b = lin.get("b", jnp.zeros(w.shape[1], w.dtype))
        if i == 0:
            w_eff = s_in[:, None] * w
            b_eff = t_in @ w + b
        else:
            w_eff, b_eff = w, b
        s_o, t_o = bn_affine(params["bns"][i], state["bns"][i])
        layers.append((w_eff * s_o[None, :], b_eff * s_o + t_o, True))
    fin = params["final"]
    if "u" in fin:
        u = fin["u"]
        if not params["linears"]:
            bu = t_in @ fin["u"]
            u = s_in[:, None] * fin["u"]
        else:
            bu = jnp.zeros(u.shape[1], u.dtype)
        layers.append((u, bu, False))
        layers.append((fin["v"], fin["b"], False))
        return layers
    wf, bf = fin["w"], fin["b"]
    if not params["linears"]:
        wf = s_in[:, None] * fin["w"]
        bf = t_in @ fin["w"] + bf
    layers.append((wf, bf, False))
    return layers


def fold_cell_affines(params, state, eps=1e-5):
    """Per-hidden-layer output-BN affine ``(s_o, t_o)`` of the fold.

    The stats byproduct (build_train_kernels ``with_stats``) accumulates
    sums of the FOLDED pre-relu activations ``y = s_o * h + t_o`` where
    ``h`` is the torch BN layer's true input; these affines invert that
    relation (:func:`unfold_layer_stats`)."""
    affs = []
    for i in range(len(params["linears"])):
        p, s = params["bns"][i], state["bns"][i]
        scale = p["scale"] / jnp.sqrt(s["var"] + eps)
        shift = p["bias"] - s["mean"] * scale
        affs.append((scale, shift))
    return affs


def unfold_layer_stats(sums, sumsqs, count, s_o, t_o):
    """Kernel-accumulated (sum y, sum y^2) of ``y = s_o*h + t_o`` over
    ``count`` samples -> (mean_h, biased var_h) of the BN layer's input
    ``h`` — the quantities the torch momentum EMA consumes."""
    mean_y = sums / count
    ey2 = sumsqs / count
    mean_h = (mean_y - t_o) / s_o
    var_h = (ey2 - 2.0 * t_o * mean_y + t_o * t_o) / (s_o * s_o) \
        - mean_h * mean_h
    return mean_h, var_h


def stats_to_bn_state(flow, meta, params, state, stats, count,
                      momentum=0.1):
    """Torch-momentum EMA update of every BN layer's running statistics
    from the kernel stats byproduct (build_train_kernels ``with_stats``).

    Row layout (matches the kernel): per cell, 2 rows (sum, sumsq) per xA
    column — the input BN's raw input — then 2 per pre-relu hidden unit,
    inverted through the fold affine.  ``count`` is the number of valid
    samples the kernel accumulated.  Returns a new bn-state pytree with
    the reference's update (momentum 0.1, UNBIASED batch variance in the
    running var — bijectors.batchnorm semantics)."""
    count = jnp.asarray(count, jnp.float32)
    unb = count / jnp.maximum(count - 1.0, 1.0)

    def ema(old, mean, var):
        return {"mean": (1.0 - momentum) * old["mean"] + momentum * mean,
                "var": (1.0 - momentum) * old["var"]
                       + momentum * var * unb}

    new_state = []
    row = 0
    for cfg, sizes, p, s in zip(flow.cells, meta, params, state):
        pt = cfg.pass_through
        seg = stats[row: row + 2 * pt]
        m_in = seg[0::2] / count
        v_in = seg[1::2] / count - m_in * m_in
        row += 2 * pt
        ns = {"bn_in": ema(s["bn_in"], m_in, v_in), "bns": []}
        affs = fold_cell_affines(p, s)
        li = 0
        for fi, fo, relu in sizes:
            if not relu:
                continue
            s_o, t_o = affs[li]
            seg = stats[row: row + 2 * fo]
            mean_h, var_h = unfold_layer_stats(seg[0::2], seg[1::2],
                                               count, s_o, t_o)
            row += 2 * fo
            ns["bns"].append(ema(s["bns"][li], mean_h, var_h))
            li += 1
        new_state.append(ns)
    # mirror the input container (the trainer carries bn state as a tuple)
    return tuple(new_state) if isinstance(state, tuple) else new_state


def fold_flow_jnp(flow, params, state):
    """All cells -> (flat list [W0, b0, W1, b1, ...] of f32 jnp arrays,
    static per-cell metadata ((fan_in, fan_out, relu), ...))."""
    flat, meta = [], []
    for p, s in zip(params, state):
        layers = fold_cell_jnp(p, s)
        meta.append(tuple((int(w.shape[0]), int(w.shape[1]), bool(r))
                          for w, _, r in layers))
        for w, b, _ in layers:
            flat.append(w.astype(jnp.float32))
            flat.append(b.astype(jnp.float32))
    return flat, tuple(meta)


def folded_forward_ref(flow, meta, flat, w):
    """Frozen-stats jnp forward from folded arrays — the mathematical
    definition the kernels implement.  jax.grad of THIS is what the hand
    VJP must match (tests/test_train_kernel.py); it is also the
    non-Pallas fallback path."""
    from nf_tpu.bijectors import coupling

    starts = []
    li = 0
    for sizes in meta:
        starts.append(li)
        li += 2 * len(sizes)

    x = w.astype(jnp.float32)
    jac = jnp.ones((w.shape[0],), jnp.float32)
    for op in flow.ops:
        tag = op[0]
        if tag == "cell":
            idx = op[1]
            cfg = flow.cells[idx]
            pt = cfg.pass_through
            t = cfg.flow_size - pt
            h = x[:, :pt]
            base = starts[idx]
            for j, (fi, fo, relu) in enumerate(meta[idx]):
                h = jnp.dot(h, flat[base + 2 * j],
                            precision=jax.lax.Precision.HIGHEST) \
                    + flat[base + 2 * j + 1]
                if relu:
                    h = jnp.maximum(h, 0.0)
            if cfg.kind == "pwquad":
                z = h.reshape(h.shape[0], t, 2 * cfg.n_bins + 1)
                xB = jnp.minimum(x[:, pt:], 1.0 - 1e-6)
                yB, factor = coupling.pwquad_compute(
                    z[:, :, : cfg.n_bins + 1], z[:, :, cfg.n_bins + 1:],
                    xB, cfg.activation)
            elif cfg.kind == "pwlin":
                xB = x[:, pt:]
                q = coupling.positivity(
                    h.reshape(h.shape[0], t, cfg.n_bins), cfg.activation)
                qsum = jnp.cumsum(q, axis=-1)
                qnorm = qsum[:, :, -1:]
                q = q / (qnorm / cfg.n_bins)
                qsum = jnp.concatenate(
                    [jnp.zeros_like(qsum[:, :, :1]), qsum / qnorm], axis=-1)
                a = xB * cfg.n_bins
                bins = jnp.minimum(jnp.floor(a).astype(jnp.int32),
                                   cfg.n_bins - 1)
                alphas = (a - bins) / cfg.n_bins
                cdf_int = coupling.take_bin(qsum, bins[:, :, None], axis=-1)
                cdf_flt = coupling.take_bin(q, bins[:, :, None], axis=-1)
                yB = cdf_flt * alphas + cdf_int
                factor = jnp.prod(cdf_flt, axis=-1)
            else:  # affine (reference 2/pi once-per-cell quirk)
                import math as _math
                xB = x[:, pt:]
                z = h.reshape(h.shape[0], 2, t)
                s0 = jnp.exp(z[:, 0])
                s1 = jnp.maximum(z[:, 1], 0.0)
                u = xB * (20.0 * s0) + s1
                yB = jnp.arctan(u) / (_math.pi / 2.0)
                factor = jnp.prod(20.0 * s0, axis=1) \
                    * (1.0 / (_math.pi / 2.0)) \
                    * jnp.prod(1.0 / (u * u + 1.0), axis=1)
            x = jnp.concatenate([x[:, :pt], yB], axis=1)
            jac = jac * factor
        elif tag == "roll":
            x = jnp.roll(x, op[1], axis=1)
        elif tag == "gather":
            x = x[:, np.asarray(op[1])]
        elif tag == "scatter":
            inv = np.empty(len(op[1]), dtype=np.int64)
            inv[np.asarray(op[1])] = np.arange(len(op[1]))
            x = x[:, inv]
    return x, jac


# ---------------------------------------------------------------------------
# In-kernel building blocks (unrolled, [sub, LANE] registers)
# ---------------------------------------------------------------------------

def _pos_and_grad(z, act):
    if act == "exp":
        e = jnp.exp(z)
        return e, e
    sq = jnp.sqrt(z * z + 4.0)
    return 0.5 * (z + sq), 0.5 * (1.0 + z / sq)


def _pwquad_quants(z_v, z_w, x_raw, act):
    """All forward quantities of one transformed dim, kept for the VJP."""
    n_bins = len(z_w)
    clamp_hi = 1.0 - 1e-6
    xB = jnp.minimum(x_raw, clamp_hi)
    in_range = (x_raw < clamp_hi).astype(jnp.float32)

    e, de = zip(*[_pos_and_grad(z, act) for z in z_w])
    g, dg = zip(*[_pos_and_grad(z, act) for z in z_v])

    W = e[0]
    for k in range(1, n_bins):
        W = W + e[k]
    inv_W = 1.0 / W
    u = [ek * inv_W for ek in e]

    T = (g[0] + g[1]) * 0.5 * u[0]
    for k in range(1, n_bins):
        T = T + (g[k] + g[k + 1]) * 0.5 * u[k]
    inv_T = 1.0 / T
    v = [gk * inv_T for gk in g]

    zero = jnp.zeros_like(xB)
    edge = zero
    vw = zero
    w_b = zero
    edge_b = zero
    vw_b = zero
    v_lo = zero
    v_hi = zero
    sel, pre = [], []
    for k in range(n_bins):
        nxt_edge = edge + u[k]
        upper = nxt_edge if k < n_bins - 1 else jnp.full_like(xB, 2.0)
        m = jnp.logical_and(xB >= edge, xB < upper).astype(jnp.float32)
        sel.append(m)
        pre.append((xB >= nxt_edge).astype(jnp.float32))
        w_b = w_b + m * u[k]
        edge_b = edge_b + m * edge
        vw_b = vw_b + m * vw
        v_lo = v_lo + m * v[k]
        v_hi = v_hi + m * v[k + 1]
        vw = vw + (v[k] + v[k + 1]) * 0.5 * u[k]
        edge = nxt_edge

    inv_wb = 1.0 / w_b
    a = (xB - edge_b) * inv_wb
    dv = v_hi - v_lo
    y = 0.5 * a * a * dv * w_b + a * v_lo * w_b + vw_b
    p = v_lo + dv * a
    return dict(n_bins=n_bins, in_range=in_range, e=e, de=de, g=g, dg=dg,
                inv_W=inv_W, u=u, inv_T=inv_T, v=v, sel=sel, pre=pre,
                w_b=w_b, inv_wb=inv_wb, a=a, dv=dv, v_lo=v_lo, y=y, p=p)


def _pwquad_dim_bwd(q, ybar, pbar):
    """Closed-form VJP of one pwquad dim (docs/TRAIN_KERNEL.md).

    Returns (zvbar list, zwbar list, xbar)."""
    n_bins = q["n_bins"]
    u, v, g = q["u"], q["v"], q["g"]
    sel, pre = q["sel"], q["pre"]
    a, dv, w_b, inv_wb = q["a"], q["dv"], q["w_b"], q["inv_wb"]
    v_lo, p = q["v_lo"], q["p"]
    zero = jnp.zeros_like(a)

    abar = ybar * p * w_b + pbar * dv
    c_vlo = ybar * w_b * (a - 0.5 * a * a) + pbar * (1.0 - a)
    c_vhi = ybar * w_b * (0.5 * a * a) + pbar * a
    c_ub_sel = ybar * (0.5 * a * a * dv + a * v_lo) - abar * a * inv_wb
    c_u_pre = -abar * inv_wb  # through E_b = sum_{j<b} u_j

    vbar = [zero] * (n_bins + 1)
    ubar = [zero] * n_bins
    for k in range(n_bins):
        trap_vb = pre[k] * (ybar * 0.5 * u[k])  # through S_b
        vbar[k] = vbar[k] + sel[k] * c_vlo + trap_vb
        vbar[k + 1] = vbar[k + 1] + sel[k] * c_vhi + trap_vb
        ubar[k] = ubar[k] + sel[k] * c_ub_sel + pre[k] * (
            c_u_pre + ybar * 0.5 * (v[k] + v[k + 1]))

    # trapezoid normalization v_k = g_k / T, T = sum (g_j+g_{j+1})/2 u_j
    sum_vbar_v = vbar[0] * v[0]
    for k in range(1, n_bins + 1):
        sum_vbar_v = sum_vbar_v + vbar[k] * v[k]
    Tbar = -sum_vbar_v * q["inv_T"]
    gbar = [vb * q["inv_T"] for vb in vbar]
    for k in range(n_bins):
        gbar[k] = gbar[k] + Tbar * 0.5 * u[k]
        gbar[k + 1] = gbar[k + 1] + Tbar * 0.5 * u[k]
        ubar[k] = ubar[k] + Tbar * 0.5 * (g[k] + g[k + 1])

    # width normalization u_j = e_j / W (softmax-style VJP):
    # zwbar_j = (ubar_j - sum_m ubar_m u_m) * de_j / W
    sum_ubar_u = ubar[0] * u[0]
    for k in range(1, n_bins):
        sum_ubar_u = sum_ubar_u + ubar[k] * u[k]
    zwbar = [(ubar[k] - sum_ubar_u) * q["de"][k] * q["inv_W"]
             for k in range(n_bins)]
    zvbar = [gbar[k] * q["dg"][k] for k in range(n_bins + 1)]

    xbar = (ybar * p + pbar * dv * inv_wb) * q["in_range"]
    return zvbar, zwbar, xbar


def _pwlin_quants(z_q, x, act):
    """Forward quantities of one piecewise-LINEAR dim (unrolled)."""
    n_bins = len(z_q)
    q_raw, dq = zip(*[_pos_and_grad(z, act) for z in z_q])
    Q = q_raw[0]
    for k in range(1, n_bins):
        Q = Q + q_raw[k]
    inv_Q = 1.0 / Q
    pdf = [qk * inv_Q * n_bins for qk in q_raw]   # mean-n_bins heights

    t = x * n_bins
    zero = jnp.zeros_like(x)
    sel = []
    pdf_b = zero
    cdf_lo = zero
    base_b = zero
    cdf = zero
    cum_sel = zero
    pre = []
    for k in range(n_bins):
        upper = jnp.full_like(x, float(k + 1)) if k < n_bins - 1 \
            else jnp.full_like(x, 2.0 * n_bins)
        m = jnp.logical_and(t >= float(k), t < upper).astype(jnp.float32)
        sel.append(m)
        pdf_b = pdf_b + m * pdf[k]
        cdf_lo = cdf_lo + m * cdf
        base_b = base_b + m * float(k)
        cdf = cdf + pdf[k] / n_bins
        cum_sel = cum_sel + m
        pre.append(1.0 - cum_sel)  # [k < b], robust at x == 1
    alpha = (t - base_b) / n_bins
    y = pdf_b * alpha + cdf_lo
    return dict(n_bins=n_bins, dq=dq, inv_Q=inv_Q, pdf=pdf, sel=sel,
                pre=pre, pdf_b=pdf_b, alpha=alpha, y=y, p=pdf_b)


def _pwlin_dim_bwd(q, ybar, pbar):
    """Closed-form VJP of one pwlin dim: returns (zqbar list, xbar).

    y = pdf_b * alpha + sum_{j<b} pdf_j / n; p = pdf_b; alpha is constant
    w.r.t. the heights (bin index fixed, t from x only), so
    pdfbar_k = ybar*(alpha*sel_k + pre_k/n) + pbar*sel_k, then the
    mean-n normalization VJP (pdf_k = n q_k / Q):
    qbar_k = (n/Q)(pdfbar_k' ...) collapses to
    zqbar_k = (pdfbar_k - sum_m pdfbar_m pdf_m / n) * n * dq_k / Q.
    dy/dx = pdf_b (the CDF property)."""
    n_bins = q["n_bins"]
    pdf, sel, pre = q["pdf"], q["sel"], q["pre"]
    alpha = q["alpha"]

    pdfbar = [ybar * (alpha * sel[k] + pre[k] / n_bins) + pbar * sel[k]
              for k in range(n_bins)]
    s = pdfbar[0] * pdf[0]
    for k in range(1, n_bins):
        s = s + pdfbar[k] * pdf[k]
    s = s / n_bins
    zqbar = [(pdfbar[k] - s) * n_bins * q["dq"][k] * q["inv_Q"]
             for k in range(n_bins)]
    xbar = ybar * q["pdf_b"]
    return zqbar, xbar


def _affine_quants(z_s, z_t, x):
    """Forward quantities of one affine dim (reference 2/pi quirk is
    applied once per cell by the caller)."""
    import math as _math

    s0 = jnp.exp(z_s)
    s1 = jnp.maximum(z_t, 0.0)
    u = x * (20.0 * s0) + s1
    inv1u2 = 1.0 / (u * u + 1.0)
    # kernel-exact atan (pwquad_sampler._atan_pos; u >= 0 always)
    from nf_tpu.ops.pwquad_sampler import _atan_pos
    y = _atan_pos(u) * jnp.float32(2.0 / _math.pi)
    p = (20.0 * s0) * inv1u2       # per-dim factor (sans the 2/pi)
    return dict(s0=s0, z_t=z_t, u=u, inv1u2=inv1u2, x=x, y=y, p=p)


def _affine_dim_bwd(q, ybar, pbar):
    """VJP of one affine dim: returns (zsbar, ztbar, xbar).

    y = atan(u)*2/pi, p = 20 s0/(1+u^2), u = 20 x s0 + relu(z_t);
    dy/du uses the TRUE atan derivative 1/(1+u^2) (the kernel's forward
    polynomial is a 1e-7-accurate approximation of atan, so its exact
    local derivative and atan's differ below f32 noise)."""
    import math as _math

    s0, u, inv1u2 = q["s0"], q["u"], q["inv1u2"]
    ubar = ybar * jnp.float32(2.0 / _math.pi) * inv1u2 \
        + pbar * (20.0 * s0) * (-2.0 * u) * inv1u2 * inv1u2
    zsbar = ubar * 20.0 * q["x"] * s0 + pbar * q["p"]
    ztbar = ubar * (q["z_t"] > 0.0).astype(jnp.float32)
    xbar = ubar * 20.0 * s0
    return zsbar, ztbar, xbar


def _mlp_fwd_saved(xs_pass, wrefs, sizes):
    """Unrolled scalar-broadcast MLP keeping every layer's activations.

    Returns ``(z, h_stack, pres)``: the output columns, every layer's
    INPUT activations (for the backward), and each ReLU layer's PRE-relu
    columns (the folded image of the next BN layer's input — what the
    stats byproduct accumulates)."""
    h = list(xs_pass)
    h_stack = [h]
    pres = []
    ref_idx = 0
    for fan_in, fan_out, relu in sizes:
        w_ref = wrefs[ref_idx]
        b_ref = wrefs[ref_idx + 1]
        ref_idx += 2
        out = []
        for o in range(fan_out):
            acc = jnp.full(h[0].shape, b_ref[o], dtype=jnp.float32)
            for i in range(fan_in):
                acc = acc + h[i] * w_ref[i, o]
            out.append(acc)
        if relu:
            pres.append(out)
            out = [jnp.maximum(zv, 0.0) for zv in out]
        h = out
        h_stack.append(h)
    return h, h_stack, pres


# ---------------------------------------------------------------------------
# Static plan
# ---------------------------------------------------------------------------

def _plan(flow, meta):
    """Per-cell (pass_through, t, n_bins, sizes, weight_start, act,
    grad_row_start) + totals.  Gradient rows: each W entry (i, o) and each
    b entry (o) of every folded layer gets one row in the [rows, LANE]
    accumulator output; the host reduces rows over lanes and unflattens."""
    cells = []
    wstart = 0
    grow = 0
    for cfg, sizes in zip(flow.cells, meta):
        if cfg.kind not in ("pwquad", "pwlin", "affine"):
            raise ValueError(f"train kernel: unsupported cell {cfg.kind!r}")
        cells.append((cfg.kind, cfg.pass_through,
                      cfg.flow_size - cfg.pass_through,
                      cfg.n_bins, sizes, wstart, cfg.activation, grow))
        wstart += 2 * len(sizes)
        for fi, fo, _ in sizes:
            grow += fi * fo + fo
    return cells, wstart, grow


def _apply_perm_fwd(xs, op, n_flow):
    tag = op[0]
    if tag == "roll":
        s = op[1] % n_flow
        return xs[-s:] + xs[:-s] if s else xs
    if tag == "gather":
        return [xs[p] for p in op[1]]
    if tag == "scatter":
        inv = [0] * n_flow
        for pos, p in enumerate(op[1]):
            inv[p] = pos
        return [xs[i] for i in inv]
    raise ValueError(op)


def _apply_perm_bwd(xbar, op, n_flow):
    """Cotangent of a permutation is its inverse permutation."""
    tag = op[0]
    if tag == "roll":
        s = op[1] % n_flow
        return xbar[s:] + xbar[:s] if s else xbar
    if tag == "gather":
        out = [None] * n_flow
        for pos, p in enumerate(op[1]):
            out[p] = xbar[pos]
        return out
    if tag == "scatter":
        return [xbar[p] for p in op[1]]
    raise ValueError(op)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def build_train_kernels(flow, meta, interpret=False, tile_sub=TRAIN_SUB,
                        with_stats=False, skip_dw=False):
    """Compile the fused (fwd, bwd) training passes.

    ``skip_dw=True`` is a MEASUREMENT-ONLY variant: the backward runs the
    full transform VJP and input-cotangent chain but skips the dW/db
    accumulation (grad rows stay zero), isolating the dW-accumulation
    term of the cost model (docs/TRAIN_KERNEL.md) so its bound is
    measured rather than estimated.  Never use it for actual training.

    fwd(flat_folded, latents [n, n_flow]) ->
        (x [n, n_flow], jac [n], stage [n_cells, n_flow, n_pad])
        (+ stats [n_stat_rows] when ``with_stats``)
    bwd(flat_folded, stage, jac, jbar [n], xbar0 [n, n_flow]) ->
        (grads list matching flat_folded, wbar [n, n_flow])

    ``stage`` holds each cell's input state (the only staged residual —
    the backward recomputes everything else per tile in registers).
    ``xbar0`` is the cotangent of the output x (zero under the reference's
    stop-gradient loss; nonzero supports pathwise training).

    ``with_stats``: the forward additionally accumulates, per hidden
    (BN-carrying) conditioner layer and output unit, the batch sums
    ``(sum y_pre, sum y_pre^2)`` of the PRE-relu folded activations over
    the valid (non-padding) samples — exact batch statistics of each BN
    layer's input up to the known fold affine (invert with
    :func:`fold_cell_affines` / :func:`unfold_layer_stats`), at ~zero
    marginal cost.  This is what lets the stale-stats trainer refresh its
    running statistics without an extra XLA forward (docs/TRAIN_KERNEL.md
    "stats update").  Row layout: cell-major, then layer-major, then
    output unit, 2 rows (sum, sumsq) each.
    """
    n_flow = flow.n_flow
    cells, n_weight_arrays, n_grad_rows = _plan(flow, meta)
    ops = flow.ops
    n_cells = len(cells)
    sub = tile_sub
    tile = sub * LANE

    # stats row base per cell: 2 rows (sum, sumsq) per xA column (the
    # input-BN's raw input) then 2 per pre-relu output unit
    stat_row = []
    n_stat_rows = 0
    for _, pt, _, _, sizes, _, _, _ in cells:
        stat_row.append(n_stat_rows)
        n_stat_rows += 2 * pt
        for fi, fo, relu in sizes:
            if relu:
                n_stat_rows += 2 * fo

    # ---------------- forward ----------------
    def fwd_kernel(*all_refs):
        if with_stats:
            lat_ref, nval_ref = all_refs[0], all_refs[1]
            refs = all_refs[2:]
            x_out, jac_out, stage_out, stats_out = \
                refs[-4], refs[-3], refs[-2], refs[-1]
            wrefs = refs[:n_weight_arrays]

            @pl.when(pl.program_id(0) == 0)
            def _init():
                stats_out[...] = jnp.zeros_like(stats_out)

            base = pl.program_id(0) * tile
            pos = base + jax.lax.broadcasted_iota(
                jnp.int32, (sub, LANE), 0) * LANE \
                + jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
            valid = (pos < nval_ref[0]).astype(jnp.float32)
        else:
            lat_ref = all_refs[0]
            refs = all_refs[1:]
            x_out, jac_out, stage_out = refs[-3], refs[-2], refs[-1]
            wrefs = refs[:n_weight_arrays]
            stats_out = None
            valid = None
        xs = [lat_ref[d] for d in range(n_flow)]
        jac = jnp.ones((sub, LANE), jnp.float32)
        for op in ops:
            if op[0] == "cell":
                kind, pt, t, n_bins, sizes, start, act, _ = cells[op[1]]
                for d in range(n_flow):
                    stage_out[op[1], d] = xs[d]
                z, _, pres = _mlp_fwd_saved(
                    xs[:pt], wrefs[start:start + 2 * len(sizes)], sizes)
                if with_stats:
                    # accumulate (sum, sum^2) of each xA column (the input
                    # BN's raw input) and every pre-relu column (the folded
                    # image of each hidden BN layer's input), masked to
                    # valid (non-padding) sample positions
                    srow = stat_row[op[1]]
                    for col in list(xs[:pt]) + [c for lc in pres for c in lc]:
                        cm = col * valid
                        stats_out[srow] = stats_out[srow] + jnp.sum(
                            cm, axis=0)
                        stats_out[srow + 1] = stats_out[srow + 1] \
                            + jnp.sum(cm * col, axis=0)
                        srow += 2
                new_tail = []
                for ti in range(t):
                    if kind == "pwquad":
                        width = 2 * n_bins + 1
                        q = _pwquad_quants(
                            z[ti * width: ti * width + n_bins + 1],
                            z[ti * width + n_bins + 1: (ti + 1) * width],
                            xs[pt + ti], act)
                    elif kind == "pwlin":
                        q = _pwlin_quants(
                            z[ti * n_bins: (ti + 1) * n_bins],
                            xs[pt + ti], act)
                    else:
                        q = _affine_quants(z[ti], z[t + ti], xs[pt + ti])
                    new_tail.append(q["y"])
                    jac = jac * q["p"]
                if kind == "affine":
                    # single 2/pi per cell (reference coupling_cells.py:68)
                    jac = jac * jnp.float32(2.0 / np.pi)
                xs = xs[:pt] + new_tail
            else:
                xs = _apply_perm_fwd(xs, op, n_flow)
        for d in range(n_flow):
            x_out[d] = xs[d]
        jac_out[0] = jac

    # ---------------- backward ----------------
    def bwd_kernel(stage_ref, jac_ref, jbar_ref, xbar0_ref, *refs):
        wrefs = refs[:n_weight_arrays]
        grad_out, wbar_out = refs[-2], refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            grad_out[...] = jnp.zeros_like(grad_out)

        jac = jac_ref[0]
        jbar = jbar_ref[0]
        xbar = [xbar0_ref[d] for d in range(n_flow)]

        for op in reversed(ops):
            if op[0] != "cell":
                xbar = _apply_perm_bwd(xbar, op, n_flow)
                continue
            kind, pt, t, n_bins, sizes, start, act, grow = cells[op[1]]
            xs_in = [stage_ref[op[1], d] for d in range(n_flow)]
            z, h_stack, _ = _mlp_fwd_saved(
                xs_in[:pt], wrefs[start:start + 2 * len(sizes)], sizes)
            width = (2 * n_bins + 1) if kind == "pwquad" else \
                (n_bins if kind == "pwlin" else 2)
            zbar = [None] * (t * width)
            new_tail_bar = []
            for ti in range(t):
                # dL/dp for THIS dim: jbar times the product of every
                # other pdf factor in the whole flow = jbar * jac / p
                if kind == "pwquad":
                    q = _pwquad_quants(
                        z[ti * width: ti * width + n_bins + 1],
                        z[ti * width + n_bins + 1: (ti + 1) * width],
                        xs_in[pt + ti], act)
                    pbar = jbar * jac / q["p"]
                    zvbar, zwbar, xb = _pwquad_dim_bwd(q, xbar[pt + ti],
                                                       pbar)
                    for k in range(n_bins + 1):
                        zbar[ti * width + k] = zvbar[k]
                    for k in range(n_bins):
                        zbar[ti * width + n_bins + 1 + k] = zwbar[k]
                elif kind == "pwlin":
                    q = _pwlin_quants(z[ti * n_bins: (ti + 1) * n_bins],
                                      xs_in[pt + ti], act)
                    pbar = jbar * jac / q["p"]
                    zqbar, xb = _pwlin_dim_bwd(q, xbar[pt + ti], pbar)
                    for k in range(n_bins):
                        zbar[ti * n_bins + k] = zqbar[k]
                else:  # affine: jac carries the per-cell 2/pi, and
                    # jac / p_d keeps it — exactly the other-factors product
                    q = _affine_quants(z[ti], z[t + ti], xs_in[pt + ti])
                    pbar = jbar * jac / q["p"]
                    zsbar, ztbar, xb = _affine_dim_bwd(q, xbar[pt + ti],
                                                       pbar)
                    zbar[ti] = zsbar
                    zbar[t + ti] = ztbar
                new_tail_bar.append(xb)

            # MLP backward; dW/db accumulate as lane-vectors (sublane-
            # reduced per tile) into grad_out rows — the host reduces over
            # lanes at the end.
            r = zbar
            # rows are laid out layer-major in FORWARD order; walk layers
            # backward but compute each layer's row base statically
            layer_row = []
            rr = grow
            for fi, fo, _ in sizes:
                layer_row.append(rr)
                rr += fi * fo + fo
            for li in range(len(sizes) - 1, -1, -1):
                fan_in, fan_out, relu = sizes[li]
                w_ref = wrefs[start + 2 * li]
                h_in = h_stack[li]
                h_out = h_stack[li + 1]
                if relu:
                    r = [r[o] * (h_out[o] > 0.0).astype(jnp.float32)
                         for o in range(fan_out)]
                if not skip_dw:
                    base = layer_row[li]
                    for i in range(fan_in):
                        for o in range(fan_out):
                            contrib = jnp.sum(h_in[i] * r[o], axis=0,
                                              keepdims=True)
                            idx = base + i * fan_out + o
                            grad_out[idx] = grad_out[idx] + contrib[0]
                    bbase = base + fan_in * fan_out
                    for o in range(fan_out):
                        contrib = jnp.sum(r[o], axis=0, keepdims=True)
                        grad_out[bbase + o] = grad_out[bbase + o] + contrib[0]
                r = [sum(r[o] * w_ref[i, o] for o in range(fan_out))
                     for i in range(fan_in)]
            xbar = [xbar[i] + r[i] for i in range(pt)] + new_tail_bar

        for d in range(n_flow):
            wbar_out[d] = xbar[d]

    # ---------------- pallas_call wrappers ----------------
    def _weight_specs_operands(flat):
        specs, operands = [], []
        for a in flat:
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            operands.append(jnp.asarray(a, jnp.float32))
        return specs, operands

    def fwd(flat, latents):
        n = latents.shape[0]
        n_tiles = -(-n // tile)
        n_pad = n_tiles * tile
        lat = jnp.pad(latents.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                      constant_values=0.5)
        lat_t = lat.T.reshape(n_flow, n_tiles * sub, LANE)
        w_specs, w_ops = _weight_specs_operands(flat)
        in_specs = [pl.BlockSpec((n_flow, sub, LANE), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)]
        operands = [lat_t]
        if with_stats:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            operands.append(jnp.asarray([n], jnp.int32))
        out_specs = [
            pl.BlockSpec((n_flow, sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cells, n_flow, sub, LANE),
                         lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_flow, n_tiles * sub, LANE),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_cells, n_flow, n_tiles * sub, LANE),
                                 jnp.float32),
        ]
        if with_stats:
            out_specs.append(pl.BlockSpec((max(n_stat_rows, 1), LANE),
                                          lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(
                (max(n_stat_rows, 1), LANE), jnp.float32))
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(n_tiles,),
            in_specs=in_specs + w_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(*operands, *w_ops)
        x_t, jac_t, stage = outs[0], outs[1], outs[2]
        x = x_t.reshape(n_flow, n_pad).T[:n]
        jac = jac_t.reshape(n_pad)[:n]
        if with_stats:
            return x, jac, stage, jnp.sum(outs[3], axis=1)[:n_stat_rows]
        return x, jac, stage

    def bwd(flat, stage, jac, jbar, xbar0):
        n = jbar.shape[0]
        n_tiles = stage.shape[2] // sub
        n_pad = n_tiles * tile

        def pad_col(v):
            return jnp.pad(v.astype(jnp.float32), (0, n_pad - n)) \
                .reshape(1, n_tiles * sub, LANE)

        jac_t = pad_col(jac)
        jbar_t = pad_col(jbar)
        xb = jnp.pad(xbar0.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
        xb_t = xb.T.reshape(n_flow, n_tiles * sub, LANE)
        w_specs, w_ops = _weight_specs_operands(flat)
        col = pl.BlockSpec((1, sub, LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
        grad_rows, wbar_t = pl.pallas_call(
            bwd_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((n_cells, n_flow, sub, LANE),
                             lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
                col, col,
                pl.BlockSpec((n_flow, sub, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ] + w_specs,
            out_specs=(
                pl.BlockSpec((n_grad_rows, LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_flow, sub, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_grad_rows, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_flow, n_tiles * sub, LANE),
                                     jnp.float32),
            ),
            interpret=interpret,
        )(stage, jac_t, jbar_t, xb_t, *w_ops)

        g_flat_rows = jnp.sum(grad_rows, axis=1)  # lane reduction on host
        grads = []
        row = 0
        for _, _, _, _, sizes, _, _, _ in cells:
            for fi, fo, _ in sizes:
                grads.append(g_flat_rows[row: row + fi * fo]
                             .reshape(fi, fo))
                row += fi * fo
                grads.append(g_flat_rows[row: row + fo])
                row += fo
        wbar = wbar_t.reshape(n_flow, n_pad).T[:n]
        return grads, wbar

    return fwd, bwd


def make_fused_train_fn(flow, meta, interpret=False, tile_sub=TRAIN_SUB,
                        with_stats=False):
    """``f(flat_folded, latents) -> (x, jac)`` with a custom VJP backed by
    the fused kernels.  Compose with :func:`fold_flow_jnp` (and jax.vjp
    through it) to train raw parameters; gradient semantics = frozen BN
    statistics (docs/TRAIN_KERNEL.md).

    ``with_stats=True`` returns ``(x, jac, stats)`` — the BN batch-sum
    byproduct (non-differentiable; its cotangent is ignored), consumed by
    :func:`stats_to_bn_state`."""
    fwd_k, bwd_k = build_train_kernels(flow, meta, interpret=interpret,
                                       tile_sub=tile_sub,
                                       with_stats=with_stats)

    if with_stats:
        @jax.custom_vjp
        def f(flat, latents):
            x, jac, _, stats = fwd_k(flat, latents)
            return x, jac, stats

        def f_fwd(flat, latents):
            x, jac, stage, stats = fwd_k(flat, latents)
            return (x, jac, stats), (tuple(flat), stage, jac)

        def f_bwd(res, cot):
            flat, stage, jac = res
            xbar, jbar, _statsbar = cot  # stats: non-diff byproduct
            grads, wbar = bwd_k(list(flat), stage, jac, jbar, xbar)
            return grads, wbar

        f.defvjp(f_fwd, f_bwd)
        return f

    @jax.custom_vjp
    def f(flat, latents):
        x, jac, _ = fwd_k(flat, latents)
        return x, jac

    def f_fwd(flat, latents):
        x, jac, stage = fwd_k(flat, latents)
        return (x, jac), (tuple(flat), stage, jac)

    def f_bwd(res, cot):
        flat, stage, jac = res
        xbar, jbar = cot
        grads, wbar = bwd_k(list(flat), stage, jac, jbar, xbar)
        # cotangent structure must match the primal inputs: flat is a list
        return grads, wbar

    f.defvjp(f_fwd, f_bwd)
    return f
