"""Analytic latent channel mappings (nf_tpu.phasespace.mappings).

Unbiasedness is the whole game: each map is a fixed bijection of [0,1]
whose Jacobian is folded into the integrand, so any estimator built on
the wrapped integrand must reproduce the unwrapped integral — pinned here
against the same scipy analytic Drell-Yan sigma used by
test_physics_validation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf_tpu.phasespace.mappings import (breit_wigner_unit_map,
                                        power_law_unit_map,
                                        remap_integrand, drell_yan_tau_map)
from test_physics_validation import (make_integrand, analytic_sigma,
                                     E, GZ, GEV2_TO_PB)


def test_breit_wigner_map_is_unit_bijection():
    u = jnp.linspace(1e-6, 1 - 1e-6, 4001)
    v, jac = breit_wigner_unit_map(u, 91.188, 2.4952, 100.0, 4e6)
    v = np.asarray(v)
    assert (v > 0).all() and (v < 1).all()
    assert (np.diff(v) > 0).all()  # strictly monotone
    # d v / d u matches autodiff
    g = jax.vmap(jax.grad(
        lambda x: breit_wigner_unit_map(x, 91.188, 2.4952, 100.0, 4e6)[0]))
    np.testing.assert_allclose(np.asarray(jac), np.asarray(g(u)),
                               rtol=1e-5)
    # exact unit-interval endpoints (total v-measure = 1 by construction;
    # a quadrature check can't resolve the steep sec^2 tails)
    v0, _ = breit_wigner_unit_map(jnp.asarray(0.0), 91.188, 2.4952,
                                  100.0, 4e6)
    v1, _ = breit_wigner_unit_map(jnp.asarray(1.0), 91.188, 2.4952,
                                  100.0, 4e6)
    np.testing.assert_allclose([float(v0), float(v1)], [0.0, 1.0],
                               atol=1e-9)


def test_power_law_map_is_unit_bijection():
    u = jnp.linspace(1e-6, 1 - 1e-6, 4001)
    v, jac = power_law_unit_map(u, -1.5, 1e-4, 1.0)
    v = np.asarray(v)
    assert (v > 0).all() and (v < 1).all()
    assert (np.diff(v) > 0).all()
    g = jax.vmap(jax.grad(
        lambda x: power_law_unit_map(x, -1.5, 1e-4, 1.0)[0]))
    np.testing.assert_allclose(np.asarray(jac), np.asarray(g(u)), rtol=1e-5)
    v0, _ = power_law_unit_map(jnp.asarray(0.0), -1.5, 1e-4, 1.0)
    v1, _ = power_law_unit_map(jnp.asarray(1.0), -1.5, 1e-4, 1.0)
    np.testing.assert_allclose([float(v0), float(v1)], [0.0, 1.0],
                               atol=1e-9)


@pytest.fixture(scope="module")
def sigma_ref():
    return analytic_sigma()


def test_drell_yan_tau_map_flattens_resonance(sigma_ref):
    """With the Z resonance importance-mapped in the tau latent, PLAIN
    uniform MC (no flow at all) resolves the sigma that unmapped uniform
    sampling cannot — and reproduces the analytic value."""
    gen, integrand = make_integrand()
    n_flow = gen.nDimPhaseSpace() + 2
    tau_dim = gen.nDimPhaseSpace()  # generator reads tau from rv[:, -2]
    mapped = remap_integrand(integrand, tau_dim,
                             drell_yan_tau_map(91.188, GZ, E))

    key = jax.random.PRNGKey(0)
    n = 1 << 18
    w = jax.random.uniform(key, (n, n_flow))
    f_plain = np.asarray(integrand(w))
    f_map = np.asarray(mapped(w))

    ess_plain = f_plain.mean() ** 2 / (f_plain ** 2).mean()
    ess_map = f_map.mean() ** 2 / (f_map ** 2).mean()
    assert ess_map > 30 * ess_plain  # the resonance is flattened

    est = f_map.mean()
    err = f_map.std(ddof=1) / np.sqrt(n)
    assert abs(est - sigma_ref) < max(6 * err, 0.02 * sigma_ref), \
        (est / GEV2_TO_PB, sigma_ref / GEV2_TO_PB, err / GEV2_TO_PB)


def test_mapped_integrand_through_manager_endpoints(sigma_ref):
    """The wrapped integrand is an ordinary f: manager.integrate consumes
    it unchanged and stays unbiased (untrained flow = valid bijection)."""
    from nf_tpu import PWQuadManager
    gen, integrand = make_integrand()
    n_flow = gen.nDimPhaseSpace() + 2
    mapped = remap_integrand(integrand, gen.nDimPhaseSpace(),
                             drell_yan_tau_map(91.188, GZ, E))
    NF = PWQuadManager(n_flow=n_flow, seed=1)
    NF.create_model(4, 8, [8] * 2)
    sig, err = NF.integrate(mapped, 6, 1 << 16, seed=3, combine="mean")
    assert err > 0
    assert abs(sig - sigma_ref) < max(6 * err, 0.05 * sigma_ref), \
        (sig / GEV2_TO_PB, sigma_ref / GEV2_TO_PB, err / GEV2_TO_PB)
