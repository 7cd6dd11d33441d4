"""Analytic latent-space channel mappings (importance maps).

Narrow resonances are nearly invisible to a flow trained from scratch: a
physical-width Z occupies ~1e-4 of the latent range, so uniform batches
see ~1 in-peak point per 1e4 samples and both the variance and KL losses
plateau (measured on the 2->4 double-resonance, tools/run_2to4.py).  The
standard generator solution — what MadGraph-class tools do and the
reference lacks entirely — is to importance-map the offending latent
dimension through the known analytic shape BEFORE the phase-space map,
flattening the resonance exactly, and let the flow learn only the smooth
remainder.  These helpers provide that composition for the nf_tpu
pipeline: each map is a fixed bijection ``u -> (r, dr/du)`` on one unit
interval, and :func:`remap_integrand` folds its Jacobian into the
integrand, so training/integration/unweighting machinery is untouched
(the wrapped integrand is just another jax-traceable ``f``).

All maps are pure jnp and exactly invertible; unbiasedness is pinned in
tests/test_mappings.py against the analytic Drell-Yan cross-section.
"""

from __future__ import annotations

import jax.numpy as jnp


def breit_wigner_unit_map(u, mass, width, s_min, s_max):
    """Map ``u ~ U[0,1]`` to ``v in [0,1]`` such that ``s = s_min +
    v*(s_max - s_min)`` is Breit-Wigner distributed around ``mass``.

    Returns ``(v, jac)`` with ``jac = dv/du`` (the factor that multiplies
    an integrand originally uniform in ``v``).  The standard tan
    substitution: s = m^2 + m*Gamma * tan(t), t uniform between the
    endpoint angles.
    """
    m2 = mass * mass
    mg = mass * width
    t_min = jnp.arctan((s_min - m2) / mg)
    t_max = jnp.arctan((s_max - m2) / mg)
    t = t_min + u * (t_max - t_min)
    s = m2 + mg * jnp.tan(t)
    ds_du = (t_max - t_min) * mg / jnp.cos(t) ** 2
    v = (s - s_min) / (s_max - s_min)
    return v, ds_du / (s_max - s_min)


def power_law_unit_map(u, exponent, x_min, x_max):
    """Map ``u ~ U[0,1]`` to ``v in [0,1]`` with ``x = x_min +
    v*(x_max-x_min)`` distributed ~ x^exponent (exponent != -1); flattens
    steeply-falling spectra (propagator tails, PDF small-x growth)."""
    a = exponent + 1.0
    xa_min = x_min ** a
    xa_max = x_max ** a
    x = (xa_min + u * (xa_max - xa_min)) ** (1.0 / a)
    dx_du = (xa_max - xa_min) / (a * x ** (a - 1.0))
    v = (x - x_min) / (x_max - x_min)
    return v, dx_du / (x_max - x_min)


def remap_integrand(f, dim, unit_map):
    """Wrap ``f([B, n]) -> [B]`` so latent dim ``dim`` passes through
    ``unit_map(u) -> (v, dv/du)`` first, with the Jacobian folded in.

    The wrapped function is an ordinary jax-traceable integrand over the
    unit cube: every nf_tpu trainer / integrator / unweighter consumes it
    unchanged, and the estimator stays exactly unbiased (the map is a
    fixed bijection of [0,1]).
    """
    def g(w):
        v, jac = unit_map(w[:, dim])
        w2 = w.at[:, dim].set(v.astype(w.dtype))
        return f(w2) * jac.astype(w.dtype)
    return g


def drell_yan_tau_map(mass, width, E_collider, tau_min=None,
                      threshold=1.0):
    """Ready-made map for the tau-mode PDF convolution: flattens the
    s-channel resonance in ``s_hat = tau * E^2``.

    The tau-mode generator draws ``tau = tau_min + r*(1-tau_min)``
    (generator.py tau branch; tau_min = (max(masses, 1 GeV)/E)^2), so a
    Breit-Wigner in s_hat is exactly a Breit-Wigner in the r coordinate's
    affine image.  Use with :func:`remap_integrand` on the tau latent
    (dim = nDimPhaseSpace(), i.e. second-from-last of the full latent when
    pdf_active with tau=True — the generator reads tau from
    ``rv[:, -2]``).
    """
    if tau_min is None:
        tau_min = (threshold / E_collider) ** 2
    S = E_collider ** 2
    s_min = tau_min * S
    s_max = S

    def unit_map(u):
        return breit_wigner_unit_map(u, mass, width, s_min, s_max)

    return unit_map
