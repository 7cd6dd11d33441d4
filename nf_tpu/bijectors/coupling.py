"""Coupling-cell bijector transforms (Muller et al. 2019, sections 4.1/4.2).

Each transform is a pure function

    (params, state, x, jac, train) -> (y, jac', state')

where ``x`` is ``[B, n_flow]``, ``jac`` is the running *multiplicative*
Jacobian ``[B]`` (the reference multiplies raw per-cell factors rather than
accumulating logs — reference coupling_cells.py:66-70,141,224-225 — and we
reproduce that convention for parity; use f64 for long chains).

The math matches the reference exactly:
  * affine: coupling_cells.py:50-70
  * piecewise-linear: coupling_cells.py:107-142
  * piecewise-quadratic: coupling_cells.py:159-228
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from nf_tpu.bijectors import conditioner


def positivity(z, act: str):
    """Bin-logit -> positive height map.

    ``exp`` is the reference's choice (softmax-style normalization,
    reference coupling_cells.py:115,178,189).  ``squareplus``
    (Barron 2021: (z + sqrt(z^2+4))/2, a smooth monotone map with
    sp(0)=1, ->z for z>>0, ->1/|z| for z<<0) is the opt-in fast variant:
    Mosaic lowers exp to a ~8-op polynomial sequence while squareplus is
    2 FMAs + sqrt, which is what dominates the fused-sampler VPU budget
    (2*n_bins+1 evaluations per transformed dimension).  The slower-than-
    exp decay for negative logits also bounds how thin a bin can get —
    a mild extra stability margin, not a behavior change, since heights
    are renormalized either way.
    """
    if act == "exp":
        return jnp.exp(z)
    if act == "squareplus":
        return 0.5 * (z + jnp.sqrt(z * z + 4.0))
    raise ValueError(f"unknown activation {act!r}")


def take_bin(arr, b, axis):
    """``take_along_axis(arr, b, axis)`` with the indexed axis reduced away,
    computed as a one-hot masked sum.

    Semantically identical (b selects exactly one slot; adding exact zeros
    changes nothing, and the vjp flows to the same slot), but on TPU the
    per-lane gather lowering serializes while the masked sum is dense VPU
    work — measured 4.7x faster per coupling cell at 2M samples, which is
    what sets the training-step and non-Pallas sampling throughput.  Only
    sensible for a small static bin count (cost is O(n_bins) elementwise).
    ``b`` must broadcast against ``arr`` with a singleton at ``axis``.
    """
    nb = arr.shape[axis]
    shape = [1] * arr.ndim
    shape[axis] = nb
    ar = jnp.arange(nb).reshape(shape)
    return jnp.sum(jnp.where(ar == b, arr, 0), axis=axis)


# ---------------------------------------------------------------------------
# Affine coupling (reference coupling_cells.py:6-70)
# ---------------------------------------------------------------------------

def affine_forward(params, state, x, jac, pass_through: int, train: bool, axis_name=None):
    """y_B = atan(x_B * 20*e^s + relu(t)) / (pi/2).

    Quirk replicated from the reference (coupling_cells.py:68): the 2/pi
    Jacobian factor is applied ONCE regardless of the number of transformed
    dimensions (exact only for transform_size == 1).
    """
    xA = x[:, :pass_through]
    xB = x[:, pass_through:]
    t = xB.shape[1]

    z, new_state = conditioner.apply(params, state, xA, train, axis_name)
    z = z.reshape(z.shape[0], 2, t)
    s0 = jnp.exp(z[:, 0])
    s1 = jnp.maximum(z[:, 1], 0.0)

    u = xB * (20.0 * s0) + s1
    diff = 1.0 / (u * u + 1.0)
    yB = jnp.arctan(u) / (math.pi / 2.0)

    jac = jac * jnp.prod(20.0 * s0, axis=1) * (1.0 / (math.pi / 2.0)) * jnp.prod(diff, axis=1)
    return jnp.concatenate([xA, yB], axis=1), jac, new_state


# ---------------------------------------------------------------------------
# Piecewise-linear coupling (reference coupling_cells.py:73-142)
# ---------------------------------------------------------------------------

def pwlin_forward(params, state, x, jac, pass_through: int, n_bins: int, train: bool, axis_name=None, act: str = "exp"):
    """PDF bin heights from the conditioner; piecewise-linear CDF transform."""
    xA = x[:, :pass_through]
    xB = x[:, pass_through:]
    t = xB.shape[1]

    z, new_state = conditioner.apply(params, state, xA, train, axis_name)
    q = positivity(z.reshape(z.shape[0], t, n_bins), act)

    qsum = jnp.cumsum(q, axis=-1)
    qnorm = qsum[:, :, -1:]
    q = q / (qnorm / n_bins)                      # PDF heights, mean 1 * n_bins
    qsum = qsum / qnorm                           # CDF at right bin edges
    qsum = jnp.concatenate([jnp.zeros_like(qsum[:, :, :1]), qsum], axis=-1)

    a = xB * n_bins
    # Clamp the bin BEFORE deriving alpha: xB == 1.0 exactly (reachable when
    # an upstream cell's f32 CDF output rounds up) would index bin n_bins,
    # where take_along_axis clipped to the last bin; take_bin's one-hot would
    # match nothing and silently zero the Jacobian.  Computing alpha from the
    # clamped bin gives alpha = 1/n_bins at xB == 1, i.e. yB = CDF right
    # edge = 1.0 — identical to the clipped-gather result.
    bins = jnp.minimum(jnp.floor(a).astype(jnp.int32), n_bins - 1)
    alphas = (a - bins) / n_bins

    cdf_int = take_bin(qsum, bins[:, :, None], axis=-1)
    cdf_flt = take_bin(q, bins[:, :, None], axis=-1)
    yB = cdf_flt * alphas + cdf_int

    jac = jac * jnp.prod(cdf_flt, axis=-1)
    return jnp.concatenate([xA, yB], axis=1), jac, new_state


# ---------------------------------------------------------------------------
# Piecewise-quadratic coupling (reference coupling_cells.py:144-228)
# ---------------------------------------------------------------------------

def pwquad_compute(v_raw, w_raw, xB, act: str = "exp"):
    """Core PWQuad transform given raw conditioner outputs.

    ``v_raw``: [B, T, n_bins+1] vertex logits, ``w_raw``: [B, T, n_bins]
    width logits, ``xB``: [B, T] inputs (already clamped).  Returns
    ``(yB, jac_factor)`` where ``jac_factor`` is the per-sample product of
    per-dimension PDF values.  Shared by the jnp path and used as the
    specification for the Pallas kernel.
    """
    n_bins = w_raw.shape[-1]

    w = positivity(w_raw, act)
    wsum = jnp.cumsum(w, axis=-1)
    wnorm = wsum[:, :, -1:]
    w = w / wnorm
    wsum = wsum / wnorm

    v = positivity(v_raw, act)
    # total integral of the piecewise-linear PDF: sum of trapezoids
    vnorm_tot = jnp.sum((v[:, :, :-1] + v[:, :, 1:]) * 0.5 * w, axis=-1, keepdims=True)
    v = v / vnorm_tot

    # bin index: number of right bin edges <= xB  (reference's masked-argmax
    # over finder*Wsum, coupling_cells.py:199-202, is equivalent)
    b = jnp.sum((wsum <= xB[:, :, None]).astype(jnp.int32), axis=-1)
    b = jnp.minimum(b, n_bins - 1)[:, :, None]

    wsum2 = jnp.concatenate([jnp.zeros_like(wsum[:, :, :1]), wsum], axis=-1)
    w_b = take_bin(w, b, axis=-1)
    edge_b = take_bin(wsum2, b, axis=-1)
    alphas = (xB - edge_b) / w_b

    # CDF value at the left edge of each bin (trapezoid cumsum of the
    # normalized PDF), reference coupling_cells.py:209-211
    vw = jnp.concatenate(
        [jnp.zeros_like(w[:, :, :1]),
         jnp.cumsum((v[:, :, :-1] + v[:, :, 1:]) * 0.5 * w, axis=-1)],
        axis=-1,
    )
    shift = take_bin(vw, b, axis=-1)
    v_lo = take_bin(v, b, axis=-1)
    v_hi = take_bin(v, b + 1, axis=-1)

    yB = 0.5 * alphas**2 * (v_hi - v_lo) * w_b + alphas * v_lo * w_b + shift
    pdf_vals = v_lo + (v_hi - v_lo) * alphas      # lerp(v_lo, v_hi, alpha)
    return yB, jnp.prod(pdf_vals, axis=-1)


def pwquad_forward(params, state, x, jac, pass_through: int, n_bins: int, train: bool, axis_name=None, act: str = "exp"):
    xA = x[:, :pass_through]
    xB = x[:, pass_through:]
    t = xB.shape[1]

    # stability clamp, reference coupling_cells.py:167
    xB = jnp.minimum(xB, 1.0 - 1e-6)

    z, new_state = conditioner.apply(params, state, xA, train, axis_name)
    z = z.reshape(z.shape[0], t, 2 * n_bins + 1)
    v_raw = z[:, :, : n_bins + 1]
    w_raw = z[:, :, n_bins + 1:]

    yB, factor = pwquad_compute(v_raw, w_raw, xB, act)
    return jnp.concatenate([xA, yB], axis=1), jac * factor, new_state


# ---------------------------------------------------------------------------
# Transposed-layout transforms: x lives as [n, B] with the batch in the TPU
# lane dimension.  With the reference's [B, n] layout (n_flow = O(10)) every
# elementwise/cumsum/BN op uses only n of the 128 lanes; transposed, all
# non-matmul work is dense VPU work.  Same math as the batch-major versions
# above (bit-differences only from reduction order inside BN/matmuls).
# Used by fast_eval.make_folded_forward_t (eval) and model.forward_t (train).
# ---------------------------------------------------------------------------

def pwquad_compute_t(v_raw, w_raw, xB, act: str = "exp"):
    """Transposed pwquad_compute: ``v_raw`` [t, n_bins+1, B], ``w_raw``
    [t, n_bins, B], ``xB`` [t, B] -> (yB [t, B], factor [B])."""
    n_bins = w_raw.shape[1]

    w = positivity(w_raw, act)
    wsum = jnp.cumsum(w, axis=1)
    wnorm = wsum[:, -1:, :]
    w = w / wnorm
    wsum = wsum / wnorm

    v = positivity(v_raw, act)
    vnorm = jnp.sum((v[:, :-1, :] + v[:, 1:, :]) * 0.5 * w, axis=1,
                    keepdims=True)
    v = v / vnorm

    b = jnp.sum((wsum <= xB[:, None, :]).astype(jnp.int32), axis=1)
    b = jnp.minimum(b, n_bins - 1)[:, None, :]
    wsum2 = jnp.concatenate([jnp.zeros_like(wsum[:, :1, :]), wsum], axis=1)
    w_b = take_bin(w, b, axis=1)
    edge_b = take_bin(wsum2, b, axis=1)
    alphas = (xB - edge_b) / w_b
    vw = jnp.concatenate(
        [jnp.zeros_like(w[:, :1, :]),
         jnp.cumsum((v[:, :-1, :] + v[:, 1:, :]) * 0.5 * w, axis=1)],
        axis=1)
    shift = take_bin(vw, b, axis=1)
    v_lo = take_bin(v, b, axis=1)
    v_hi = take_bin(v, b + 1, axis=1)
    yB = 0.5 * alphas ** 2 * (v_hi - v_lo) * w_b + alphas * v_lo * w_b + shift
    pdf = v_lo + (v_hi - v_lo) * alphas
    return yB, jnp.prod(pdf, axis=0)


def pwlin_compute_t(q_raw, xB, act: str = "exp"):
    """Transposed pwlin transform core: ``q_raw`` [t, n_bins, B],
    ``xB`` [t, B] -> (yB [t, B], factor [B])."""
    n_bins = q_raw.shape[1]
    q = positivity(q_raw, act)
    qsum = jnp.cumsum(q, axis=1)
    qnorm = qsum[:, -1:, :]
    q = q / (qnorm / n_bins)
    qsum = jnp.concatenate(
        [jnp.zeros_like(qsum[:, :1, :]), qsum / qnorm], axis=1)
    a = xB * n_bins
    # clamp bin before alpha: see pwlin_forward
    b = jnp.minimum(jnp.floor(a).astype(jnp.int32), n_bins - 1)[:, None, :]
    alphas = (a - b[:, 0, :]) / n_bins
    cdf_int = take_bin(qsum, b, axis=1)
    cdf_flt = take_bin(q, b, axis=1)
    yB = cdf_flt * alphas + cdf_int
    return yB, jnp.prod(cdf_flt, axis=0)


def affine_forward_t(params, state, x, jac, pass_through: int, train: bool,
                     axis_name=None):
    """Transposed affine cell: ``x`` [n, B], ``jac`` [B] (incl. the
    reference's single-2/pi quirk, coupling_cells.py:68)."""
    xA = x[:pass_through]
    xB = x[pass_through:]
    t = xB.shape[0]

    z, new_state = conditioner.apply_t(params, state, xA, train, axis_name)
    s0 = jnp.exp(z[:t])
    s1 = jnp.maximum(z[t:], 0.0)
    u = xB * (20.0 * s0) + s1
    diff = 1.0 / (u * u + 1.0)
    yB = jnp.arctan(u) / (math.pi / 2.0)
    jac = jac * jnp.prod(20.0 * s0, axis=0) * (1.0 / (math.pi / 2.0)) \
        * jnp.prod(diff, axis=0)
    return jnp.concatenate([xA, yB], axis=0), jac, new_state


def pwlin_forward_t(params, state, x, jac, pass_through: int, n_bins: int,
                    train: bool, axis_name=None, act: str = "exp"):
    xA = x[:pass_through]
    xB = x[pass_through:]
    t = xB.shape[0]
    z, new_state = conditioner.apply_t(params, state, xA, train, axis_name)
    yB, factor = pwlin_compute_t(z.reshape(t, n_bins, z.shape[-1]), xB, act)
    return jnp.concatenate([xA, yB], axis=0), jac * factor, new_state


def pwquad_forward_t(params, state, x, jac, pass_through: int, n_bins: int,
                     train: bool, axis_name=None, act: str = "exp"):
    xA = x[:pass_through]
    xB = jnp.minimum(x[pass_through:], 1.0 - 1e-6)  # reference clamp, :167
    t = xB.shape[0]
    z, new_state = conditioner.apply_t(params, state, xA, train, axis_name)
    z = z.reshape(t, 2 * n_bins + 1, z.shape[-1])
    yB, factor = pwquad_compute_t(z[:, : n_bins + 1, :], z[:, n_bins + 1:, :],
                                  xB, act)
    return jnp.concatenate([xA, yB], axis=0), jac * factor, new_state


# ---------------------------------------------------------------------------
# Inverse transforms (x -> w).  The reference lists inversion as an
# unimplemented TODO (reference README.md:69); these complete it.  All
# inverses assume eval-mode conditioners (BatchNorm running stats) so the
# map is a fixed bijection; pass-through dims condition both directions.
# ---------------------------------------------------------------------------

def affine_inverse(params, state, y, jac, pass_through: int, train: bool = False):
    """Invert y_B = atan(x_B * 20 e^s + relu(t)) / (pi/2).

    Returns (x, jac') where jac' multiplies in the inverse-map Jacobian
    (reciprocal of the forward factor, including the replicated 2/pi quirk).
    """
    yA = y[:, :pass_through]
    yB = y[:, pass_through:]

    z, new_state = conditioner.apply(params, state, yA, train)
    t = yB.shape[1]
    z = z.reshape(z.shape[0], 2, t)
    s0 = jnp.exp(z[:, 0])
    s1 = jnp.maximum(z[:, 1], 0.0)

    u = jnp.tan(yB * (math.pi / 2.0))
    xB = (u - s1) / (20.0 * s0)
    diff = 1.0 / (u * u + 1.0)
    fwd_factor = jnp.prod(20.0 * s0, axis=1) * (1.0 / (math.pi / 2.0)) \
        * jnp.prod(diff, axis=1)
    return jnp.concatenate([yA, xB], axis=1), jac / fwd_factor, new_state


def pwlin_inverse(params, state, y, jac, pass_through: int, n_bins: int,
                  train: bool = False, act: str = "exp"):
    """Invert the piecewise-linear CDF: find the bin by CDF edge, then
    linear solve."""
    yA = y[:, :pass_through]
    yB = y[:, pass_through:]
    t = yB.shape[1]

    z, new_state = conditioner.apply(params, state, yA, train)
    q = positivity(z.reshape(z.shape[0], t, n_bins), act)
    qsum = jnp.cumsum(q, axis=-1)
    qnorm = qsum[:, :, -1:]
    q = q / (qnorm / n_bins)
    qsum = qsum / qnorm
    qsum2 = jnp.concatenate([jnp.zeros_like(qsum[:, :, :1]), qsum], axis=-1)

    b = jnp.sum((qsum <= yB[:, :, None]).astype(jnp.int32), axis=-1)
    b = jnp.minimum(b, n_bins - 1)[:, :, None]
    cdf_lo = take_bin(qsum2, b, axis=-1)
    q_b = take_bin(q, b, axis=-1)

    alphas = (yB - cdf_lo) / q_b                    # in [0, 1/n_bins)
    xB = (b[:, :, 0].astype(yB.dtype) + alphas * n_bins) / n_bins
    jac = jac / jnp.prod(q_b, axis=-1)
    return jnp.concatenate([yA, xB], axis=1), jac, new_state


def pwquad_invert(v_raw, w_raw, yB, act: str = "exp"):
    """Invert the quadratic CDF given raw conditioner outputs.

    Mirrors pwquad_compute: locate the bin via the CDF-at-edge prefix sums,
    then solve the per-bin quadratic for alpha.  Returns (xB, fwd_factor)
    with fwd_factor the forward-map Jacobian at the recovered point.
    """
    n_bins = w_raw.shape[-1]

    w = positivity(w_raw, act)
    wsum = jnp.cumsum(w, axis=-1)
    wnorm = wsum[:, :, -1:]
    w = w / wnorm
    wsum = wsum / wnorm

    v = positivity(v_raw, act)
    vnorm_tot = jnp.sum((v[:, :, :-1] + v[:, :, 1:]) * 0.5 * w, axis=-1,
                        keepdims=True)
    v = v / vnorm_tot

    vw_body = jnp.cumsum((v[:, :, :-1] + v[:, :, 1:]) * 0.5 * w, axis=-1)
    vw = jnp.concatenate([jnp.zeros_like(w[:, :, :1]), vw_body], axis=-1)

    # bin: number of CDF edges <= yB
    b = jnp.sum((vw_body <= yB[:, :, None]).astype(jnp.int32), axis=-1)
    b = jnp.minimum(b, n_bins - 1)[:, :, None]

    wsum2 = jnp.concatenate([jnp.zeros_like(wsum[:, :, :1]), wsum], axis=-1)
    w_b = take_bin(w, b, axis=-1)
    edge_b = take_bin(wsum2, b, axis=-1)
    vw_b = take_bin(vw, b, axis=-1)
    v_lo = take_bin(v, b, axis=-1)
    v_hi = take_bin(v, b + 1, axis=-1)

    # solve 0.5 a (v_hi - v_lo) w alpha^2 + v_lo w alpha + vw_b = yB
    c = (yB - vw_b) / w_b
    dv = v_hi - v_lo
    # numerically stable root: alpha = 2c / (v_lo + sqrt(v_lo^2 + 2 dv c))
    disc = jnp.sqrt(jnp.maximum(v_lo * v_lo + 2.0 * dv * c, 0.0))
    linear = c / jnp.where(v_lo == 0, 1.0, v_lo)
    alphas = jnp.where(jnp.abs(dv) > 1e-12 * (v_lo + v_hi),
                       2.0 * c / jnp.where(disc + v_lo == 0, 1.0, disc + v_lo),
                       linear)
    xB = edge_b + alphas * w_b
    pdf_vals = v_lo + dv * alphas
    return xB, jnp.prod(pdf_vals, axis=-1)


def pwquad_inverse(params, state, y, jac, pass_through: int, n_bins: int,
                   train: bool = False, act: str = "exp"):
    yA = y[:, :pass_through]
    yB = y[:, pass_through:]
    t = yB.shape[1]

    z, new_state = conditioner.apply(params, state, yA, train)
    z = z.reshape(z.shape[0], t, 2 * n_bins + 1)
    v_raw = z[:, :, : n_bins + 1]
    w_raw = z[:, :, n_bins + 1:]

    xB, fwd_factor = pwquad_invert(v_raw, w_raw, yB, act)
    return jnp.concatenate([yA, xB], axis=1), jac / fwd_factor, new_state
