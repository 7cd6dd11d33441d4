"""Inverse-flow tests: roundtrip w -> x -> w with Jacobian reciprocity.

The reference lists coupling-cell inversion as an unimplemented TODO
(reference README.md:69); nf_tpu implements it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.flows import factory, model as fmodel


@pytest.mark.parametrize("build", [
    lambda k: factory.build_pwquad_flow(k, 2, 2, 4, (3, 3, 3), jnp.float64),
    lambda k: factory.build_pwquad_flow(k, 5, 2, 6, (8,), jnp.float64),
    lambda k: factory.build_pwquad_flow(k, 10, 2, 4, (8,), jnp.float64),
    lambda k: factory.build_pwlin_flow(k, 4, 2, 3, 8, (8, 8), 1, jnp.float64),
    lambda k: factory.build_affine_flow(k, 2, 1, 2, (6,), 1, jnp.float64),
])
@pytest.mark.slow
def test_roundtrip(build):
    flow, params, state = build(jax.random.PRNGKey(0))
    w = jax.random.uniform(jax.random.PRNGKey(1), (128, flow.n_flow),
                           dtype=jnp.float64, minval=1e-4, maxval=1.0 - 1e-4)
    x, jac_f, _ = fmodel.forward(flow, params, state, w, False)
    w_back, jac_i, _ = fmodel.inverse(flow, params, state, x, False)
    np.testing.assert_allclose(np.asarray(w_back), np.asarray(w), atol=5e-10)
    np.testing.assert_allclose(np.asarray(jac_f * jac_i),
                               np.ones(128), rtol=1e-8)


def test_inverse_is_jittable():
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(2), 3, 2, 6, (6,), jnp.float64)
    inv = jax.jit(lambda x: fmodel.inverse(flow, params, state, x, False))
    w = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), dtype=jnp.float64)
    x, _, _ = fmodel.forward(flow, params, state, w, False)
    w_back, _, _ = inv(x)
    np.testing.assert_allclose(np.asarray(w_back), np.asarray(w), atol=5e-10)
