"""Phase-space inversion roundtrip tests.

``invertKinematics_batch`` must recover the latent random variables that
produced a set of COM-frame momenta — the invertibility the generator's
name promises (reference TODO, README.md:69).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.phasespace import FlatInvertiblePhasespace

E_CM = 1000.0


def _uniform(key, shape):
    return jax.random.uniform(key, shape, dtype=jnp.float64,
                              minval=1e-6, maxval=1.0 - 1e-6)


@pytest.mark.parametrize("masses", [
    [0.0, 0.0],
    [100.0, 200.0],
    [0.0, 0.0, 0.0],
    [50.0, 50.0, 50.0],
    [173.0, 4.7, 0.0, 80.4],
])
def test_roundtrip_no_pdf(masses):
    gen = FlatInvertiblePhasespace([0.0, 0.0], masses)
    rv = _uniform(jax.random.PRNGKey(0), (256, gen.nDimPhaseSpace()))
    momenta, _ = gen.generateKinematics_batch(E_CM, rv)
    rv_back = gen.invertKinematics_batch(E_CM, momenta)
    np.testing.assert_allclose(np.asarray(rv_back), np.asarray(rv),
                               atol=1e-7)


def test_roundtrip_pdf_tau_mode():
    gen = FlatInvertiblePhasespace([0.0, 0.0], [91.0, 91.0],
                                   pdf=None, pdf_active=True, tau=True)
    rv = _uniform(jax.random.PRNGKey(1), (256, gen.nDimPhaseSpace() + 2))
    momenta, _ = gen.generateKinematics_batch(E_CM, rv)
    # recompute the xb's the forward map derived
    tau_min = (max(sum([91.0, 91.0]), 1.0) / E_CM) ** 2
    tau = tau_min + (1 - tau_min) * rv[:, -2]
    ycm_min = 0.5 * jnp.log(tau)
    ycm = ycm_min + (-2 * ycm_min) * rv[:, -1]
    xb_1 = jnp.sqrt(tau) * jnp.exp(ycm)
    xb_2 = jnp.sqrt(tau) * jnp.exp(-ycm)
    rv_back = gen.invertKinematics_batch(E_CM, momenta, xb_1, xb_2)
    np.testing.assert_allclose(np.asarray(rv_back), np.asarray(rv), atol=1e-7)


def test_roundtrip_pdf_direct_mode():
    gen = FlatInvertiblePhasespace([0.0, 0.0], [10.0, 10.0, 10.0],
                                   pdf=None, pdf_active=True, tau=False)
    rv = np.random.RandomState(2).uniform(1e-3, 1 - 1e-3,
                                          (128, gen.nDimPhaseSpace() + 2))
    rv[:, -2:] = 0.3 + 0.6 * rv[:, -2:]
    rv = jnp.asarray(rv)
    momenta, _ = gen.generateKinematics_batch(E_CM, rv)
    rv_back = gen.invertKinematics_batch(E_CM, momenta,
                                         xb_1=rv[:, -1], xb_2=rv[:, -2])
    np.testing.assert_allclose(np.asarray(rv_back), np.asarray(rv), atol=1e-7)


def test_invert_requires_xb_when_pdf_active():
    gen = FlatInvertiblePhasespace([0.0, 0.0], [10.0, 10.0],
                                   pdf=None, pdf_active=True)
    from nf_tpu.phasespace import PhaseSpaceGeneratorError
    with pytest.raises(PhaseSpaceGeneratorError):
        gen.invertKinematics_batch(E_CM, jnp.zeros((4, 4, 4)))


def test_invert_is_jittable():
    gen = FlatInvertiblePhasespace([0.0, 0.0], [5.0, 5.0, 0.0])
    rv = _uniform(jax.random.PRNGKey(3), (64, gen.nDimPhaseSpace()))
    momenta, _ = gen.generateKinematics_batch(E_CM, rv)
    inv = jax.jit(lambda m: gen.invertKinematics_batch(E_CM, m))
    rv_back = inv(momenta)
    np.testing.assert_allclose(np.asarray(rv_back), np.asarray(rv), atol=1e-7)
