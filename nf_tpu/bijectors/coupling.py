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

def pwlin_forward(params, state, x, jac, pass_through: int, n_bins: int, train: bool, axis_name=None):
    """PDF bin heights from the conditioner; piecewise-linear CDF transform."""
    xA = x[:, :pass_through]
    xB = x[:, pass_through:]
    t = xB.shape[1]

    z, new_state = conditioner.apply(params, state, xA, train, axis_name)
    q = jnp.exp(z.reshape(z.shape[0], t, n_bins))

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

def pwquad_compute(v_raw, w_raw, xB):
    """Core PWQuad transform given raw conditioner outputs.

    ``v_raw``: [B, T, n_bins+1] vertex logits, ``w_raw``: [B, T, n_bins]
    width logits, ``xB``: [B, T] inputs (already clamped).  Returns
    ``(yB, jac_factor)`` where ``jac_factor`` is the per-sample product of
    per-dimension PDF values.  Shared by the jnp path and used as the
    specification for the Pallas kernel.
    """
    n_bins = w_raw.shape[-1]

    w = jnp.exp(w_raw)
    wsum = jnp.cumsum(w, axis=-1)
    wnorm = wsum[:, :, -1:]
    w = w / wnorm
    wsum = wsum / wnorm

    v = jnp.exp(v_raw)
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


def pwquad_forward(params, state, x, jac, pass_through: int, n_bins: int, train: bool, axis_name=None):
    xA = x[:, :pass_through]
    xB = x[:, pass_through:]
    t = xB.shape[1]

    # stability clamp, reference coupling_cells.py:167
    xB = jnp.minimum(xB, 1.0 - 1e-6)

    z, new_state = conditioner.apply(params, state, xA, train, axis_name)
    z = z.reshape(z.shape[0], t, 2 * n_bins + 1)
    v_raw = z[:, :, : n_bins + 1]
    w_raw = z[:, :, n_bins + 1:]

    yB, factor = pwquad_compute(v_raw, w_raw, xB)
    return jnp.concatenate([xA, yB], axis=1), jac * factor, new_state


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
                  train: bool = False):
    """Invert the piecewise-linear CDF: find the bin by CDF edge, then
    linear solve."""
    yA = y[:, :pass_through]
    yB = y[:, pass_through:]
    t = yB.shape[1]

    z, new_state = conditioner.apply(params, state, yA, train)
    q = jnp.exp(z.reshape(z.shape[0], t, n_bins))
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


def pwquad_invert(v_raw, w_raw, yB):
    """Invert the quadratic CDF given raw conditioner outputs.

    Mirrors pwquad_compute: locate the bin via the CDF-at-edge prefix sums,
    then solve the per-bin quadratic for alpha.  Returns (xB, fwd_factor)
    with fwd_factor the forward-map Jacobian at the recovered point.
    """
    n_bins = w_raw.shape[-1]

    w = jnp.exp(w_raw)
    wsum = jnp.cumsum(w, axis=-1)
    wnorm = wsum[:, :, -1:]
    w = w / wnorm
    wsum = wsum / wnorm

    v = jnp.exp(v_raw)
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
                   train: bool = False):
    yA = y[:, :pass_through]
    yB = y[:, pass_through:]
    t = yB.shape[1]

    z, new_state = conditioner.apply(params, state, yA, train)
    z = z.reshape(z.shape[0], t, 2 * n_bins + 1)
    v_raw = z[:, :, : n_bins + 1]
    w_raw = z[:, :, n_bins + 1:]

    xB, fwd_factor = pwquad_invert(v_raw, w_raw, yB)
    return jnp.concatenate([yA, xB], axis=1), jac / fwd_factor, new_state
