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


# ---------------------------------------------------------------------------
# Folded eval-mode inverse / density (fast_eval.make_folded_inverse)
# ---------------------------------------------------------------------------

def _flows_for_inverse():
    from nf_tpu.flows import factory
    return [
        factory.build_pwquad_flow(jax.random.PRNGKey(0), 2, 4, 4, (4, 4),
                                  jnp.float64),
        factory.build_pwquad_flow(jax.random.PRNGKey(1), 8, 6, 4, (6,),
                                  jnp.float64),
        factory.build_pwlin_flow(jax.random.PRNGKey(2), 3, 1, 3, 8, (8,), 1,
                                 jnp.float64),
        factory.build_affine_flow(jax.random.PRNGKey(3), 2, 1, 2, (6,), 1,
                                  jnp.float64),
    ]


@pytest.mark.slow
def test_folded_inverse_roundtrip_and_density():
    from nf_tpu.flows.fast_eval import (
        make_folded_forward, make_folded_inverse, make_density)
    for flow, params, state in _flows_for_inverse():
        fwd = make_folded_forward(flow, params, state, jnp.float64)
        inv = make_folded_inverse(flow, params, state, jnp.float64)
        w = jax.random.uniform(jax.random.PRNGKey(9), (512, flow.n_flow),
                               jnp.float64, minval=1e-4, maxval=1 - 1e-4)
        x, jac_f = fwd(w)
        w2, jac_i = inv(x)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w),
                                   rtol=1e-8, atol=1e-10)
        # inverse-map Jacobian is the reciprocal of the forward's
        np.testing.assert_allclose(np.asarray(jac_i * jac_f),
                                   np.ones(512), rtol=1e-9)

        # q(x) = jac_inv is a density: MC integral over the unit cube == 1
        q = make_density(flow, params, state, jnp.float64)
        u = jax.random.uniform(jax.random.PRNGKey(11), (20000, flow.n_flow),
                               jnp.float64, minval=1e-4, maxval=1 - 1e-4)
        qv = np.asarray(q(u))
        assert np.isfinite(qv).all() and (qv > 0).all()
        assert abs(qv.mean() - 1.0) < 5 * qv.std() / np.sqrt(len(qv)) + 0.02


def test_folded_inverse_matches_stateful_inverse():
    from nf_tpu.flows import factory, model as fmodel
    from nf_tpu.flows.fast_eval import make_folded_inverse
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(4), 2, 4, 4, (4, 4), jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(5), (256, 2), jnp.float64,
                           minval=1e-3, maxval=1 - 1e-3)
    w_s, jac_s, _ = fmodel.inverse(flow, params, state, x)
    w_f, jac_f = make_folded_inverse(flow, params, state, jnp.float64)(x)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_s), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(jac_f), np.asarray(jac_s),
                               rtol=1e-10)
