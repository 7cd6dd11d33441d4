"""Lorentz-vector / collider-kinematics kit (pure jnp).

Vectorized counterparts of the reference's PhaseSpace/utils.py.  Conventions:
4-vectors are ``[..., 4]`` with components (E, px, py, pz); metric (+,-,-,-).
All functions are pure and shape-polymorphic over leading batch dims where
noted.  Reference line citations refer to /root/reference/nisrep/PhaseSpace/utils.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_EPS = float(np.finfo(np.float64).eps ** 0.5)
_HUGE = float(np.finfo(np.float64).max)


def rho2(p):
    """Spatial radius squared |p|^2 for [..., 4] vectors (utils.py:21-29)."""
    return jnp.sum(p[..., 1:] * p[..., 1:], axis=-1)


def set_square(p, square):
    """Reset the time component so p.p == square (utils.py:5-19).

    The argument is clamped at zero before the sqrt: in f32 ultra-
    relativistic kinematics can round rho2+square fractionally negative,
    where the reference would emit NaN.
    """
    e = jnp.sqrt(jnp.maximum(rho2(p) + square, 0.0))
    return jnp.concatenate([e[..., None], p[..., 1:]], axis=-1)


def minkowski_dot(a, b):
    """Minkowski dot product for [..., 4] vectors (utils.py:46-48)."""
    return (a[..., 0] * b[..., 0] - a[..., 1] * b[..., 1]
            - a[..., 2] * b[..., 2] - a[..., 3] * b[..., 3])


def square(p):
    return minkowski_dot(p, p)


def boost_vector(p):
    """beta = p_space / E (utils.py:31-36).

    Zero-energy (fully degenerate) vectors get beta = 0 instead of the
    reference's 0/0 NaN.
    """
    e = p[..., 0:1]
    return jnp.where(e != 0, p[..., 1:] / jnp.where(e != 0, e, 1.0), 0.0)


def boost(p, beta):
    """Boost [..., 4] vectors by velocity ``beta`` [..., 3] (utils.py:58-106).

    ``boost(p, -boost_vector(p))`` brings p to its rest frame (M,0,0,0).
    Broadcasts: a single beta per event against multiple particles works with
    beta shaped [..., 1, 3].
    """
    b2 = jnp.sum(beta * beta, axis=-1)
    # clamp: for near-massless boosts f32 rounds b2 to >= 1 (the reference
    # would produce NaN); the clamp bounds gamma at ~3e5
    b2 = jnp.minimum(b2, 1.0 - 1e-11)
    gamma = 1.0 / jnp.sqrt(1.0 - b2)
    bp = jnp.sum(p[..., 1:] * beta, axis=-1)
    gamma2 = jnp.where(b2 > 0, (gamma - 1.0) / jnp.where(b2 > 0, b2, 1.0), 0.0)
    factor = gamma2 * bp + gamma * p[..., 0]
    space = p[..., 1:] + factor[..., None] * beta
    e = gamma * (p[..., 0] + bp)
    return jnp.concatenate([e[..., None], space], axis=-1)


def uniform_distr(r, minv, maxv):
    """Map r in [0,1] uniformly into (minv, maxv); returns (value, jacobian)
    (utils.py:124-132)."""
    dvar = maxv - minv
    return minv + dvar * r, dvar


def boost_to_lab_frame(momenta, xb_1, xb_2):
    """Boost COM-frame momenta [B, P, 4] to the lab frame given Bjorken x's
    (utils.py:134-146).  No-op for events with xb_1 == xb_2 == 1."""
    ref_lab = momenta[:, 0, :] * xb_1[:, None] + momenta[:, 1, :] * xb_2[:, None]
    r2 = rho2(ref_lab)
    safe_ref = jnp.where(r2[:, None] > 0, ref_lab, jnp.array([1.0, 0, 0, 0], dtype=momenta.dtype))
    beta = boost_vector(safe_ref)
    boosted = boost(momenta, beta[:, None, :])
    need = ((xb_1 != 1.0) | (xb_2 != 1.0)) & (r2 > 0)
    return jnp.where(need[:, None, None], boosted, momenta)


def pseudo_rapidity(p, eps=_EPS, huge=None):
    """Pseudorapidity of [..., 4] vectors (utils.py:151-166)."""
    if huge is None:
        huge = float(jnp.finfo(p.dtype).max)
    pt = jnp.sqrt(jnp.sum(p[..., 1:3] ** 2, axis=-1))
    th = jnp.arctan2(pt, p[..., 3])
    degenerate = (pt < eps) & (jnp.abs(p[..., 3]) < eps)
    return jnp.where(degenerate, huge, -jnp.log(jnp.tan(th / 2.0)))


def delta_phi(p1, p2, eps=_EPS, huge=None):
    """phi-angle separation (utils.py:170-180)."""
    if huge is None:
        huge = float(jnp.finfo(p1.dtype).max)
    pt1 = jnp.sqrt(jnp.sum(p1[..., 1:3] ** 2, axis=-1))
    pt2 = jnp.sqrt(jnp.sum(p2[..., 1:3] ** 2, axis=-1))
    denom = pt1 * pt2
    tmp = (p1[..., 1] * p2[..., 1] + p1[..., 2] * p2[..., 2]) / jnp.where(denom == 0, 1.0, denom)
    clipped = jnp.where(jnp.abs(tmp) > 1.0, jnp.sign(tmp), tmp)
    out = jnp.arccos(clipped)
    return jnp.where((pt1 == 0.0) | (pt2 == 0.0), huge, out)


def delta_r(p1, p2):
    """deltaR separation (utils.py:182-187)."""
    deta = pseudo_rapidity(p1) - pseudo_rapidity(p2)
    dphi = delta_phi(p1, p2)
    return jnp.sqrt(deta ** 2 + dphi ** 2)


def cos_theta(p):
    """Polar-angle cosine pz/|p| of [..., 4] vectors (utils.py:108-112)."""
    ptot = jnp.sqrt(jnp.sum(p[..., 1:] ** 2, axis=-1))
    return p[..., 3] / ptot


def phi(p):
    """Azimuthal angle atan2(py, px) (utils.py:118-120)."""
    return jnp.arctan2(p[..., 2], p[..., 1])


def spatial_dot(a, b):
    """Euclidean dot product of the spatial parts (utils.py:50-56)."""
    return jnp.sum(a[..., 1:4] * b[..., 1:4], axis=-1)
