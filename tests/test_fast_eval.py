"""Folded fast-eval forward equals the stateful eval forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.flows import factory, model as fmodel
from nf_tpu.flows.fast_eval import make_folded_forward


@pytest.mark.parametrize("build", [
    lambda k: factory.build_pwquad_flow(k, 2, 2, 4, (3, 3, 3), jnp.float32),
    lambda k: factory.build_pwquad_flow(k, 10, 2, 4, (8,), jnp.float32),
    lambda k: factory.build_pwlin_flow(k, 4, 2, 3, 8, (8, 8), 1, jnp.float32),
    lambda k: factory.build_affine_flow(k, 2, 1, 2, (6,), 1, jnp.float32),
])
def test_folded_matches_eval_forward(build):
    flow, params, state = build(jax.random.PRNGKey(0))
    fast = jax.jit(make_folded_forward(flow, params, state))
    w = jax.random.uniform(jax.random.PRNGKey(1), (512, flow.n_flow),
                           dtype=jnp.float32)
    x_ref, jac_ref, _ = fmodel.forward(flow, params, state, w, False)
    x, jac = fast(w)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref), rtol=3e-3)


@pytest.mark.parametrize("build", [
    lambda k: factory.build_pwquad_flow(k, 2, 2, 4, (3, 3, 3), jnp.float32),
    lambda k: factory.build_pwquad_flow(k, 10, 2, 4, (8,), jnp.float32),
    lambda k: factory.build_pwlin_flow(k, 4, 2, 3, 8, (8, 8), 1, jnp.float32),
    lambda k: factory.build_affine_flow(k, 2, 1, 2, (6,), 1, jnp.float32),
])
def test_transposed_matches_eval_forward(build):
    from nf_tpu.flows.fast_eval import make_folded_forward_t

    flow, params, state = build(jax.random.PRNGKey(0))
    fast = jax.jit(make_folded_forward_t(flow, params, state))
    w = jax.random.uniform(jax.random.PRNGKey(1), (512, flow.n_flow),
                           dtype=jnp.float32)
    x_ref, jac_ref, _ = fmodel.forward(flow, params, state, w, False)
    x, jac = fast(w)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref), rtol=3e-3)
