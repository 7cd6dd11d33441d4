"""Lane-efficient transposed training forward (VERDICT r3 #3).

``fmodel.forward_t`` keeps the batch in the TPU lane dimension ([n_flow, B]
internally) so the hot forward+backward — elementwise CDF math, cumsums,
BatchNorm batch statistics, and all their VJPs — is dense VPU work instead
of using n_flow of 128 lanes.  Same math as ``forward``; these tests pin
output/state/gradient equivalence and the manager's ``train_layout`` flag.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf_tpu.flows import factory, model as fmodel

BUILDS = [
    ("pwquad10", lambda k: factory.build_pwquad_flow(
        k, 10, 8, 8, (16, 16), jnp.float64)),
    ("pwquad4", lambda k: factory.build_pwquad_flow(
        k, 4, 4, 6, (8, 8), jnp.float64)),
    ("pwquad_variant", lambda k: factory.build_pwquad_flow(
        k, 10, 8, 8, (16, 16), jnp.float64,
        final_rank=4, activation="squareplus")),
    ("pwlin", lambda k: factory.build_pwlin_flow(
        k, 3, 1, 3, 5, (6, 6), 1, jnp.float64)),
    ("affine", lambda k: factory.build_affine_flow(
        k, 3, 2, 3, (6, 6), 1, jnp.float64)),
]


@pytest.mark.parametrize("name,build", BUILDS, ids=[b[0] for b in BUILDS])
@pytest.mark.slow
def test_forward_t_matches_forward(name, build):
    flow, params, state = build(jax.random.PRNGKey(0))
    w = jax.random.uniform(jax.random.PRNGKey(1), (512, flow.n_flow),
                           dtype=jnp.float64)
    for train in (True, False):
        x1, j1, s1 = fmodel.forward(flow, params, state, w, train)
        x2, j2, s2 = fmodel.forward_t(flow, params, state, w, train)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(j2), np.asarray(j1),
                                   rtol=1e-11)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-12)


@pytest.mark.slow
def test_forward_t_gradient_matches():
    """Variance-loss gradients agree between layouts (the training path)."""
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(2), 4, 4, 6, (8, 8), jnp.float64)
    w = jax.random.uniform(jax.random.PRNGKey(3), (256, 4), dtype=jnp.float64)

    def loss(p, fwd):
        x, jac, _ = fwd(flow, p, state, w, True)
        fx = jnp.exp(-jnp.sum((jax.lax.stop_gradient(x) - 0.5) ** 2, -1))
        r = fx * jac
        return jnp.mean((r - jnp.mean(r)) ** 2)

    g1 = jax.grad(lambda p: loss(p, fmodel.forward))(params)
    g2 = jax.grad(lambda p: loss(p, fmodel.forward_t))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-12)


def test_manager_train_layouts_agree():
    """Full manager training runs converge equivalently in both layouts
    (same seeds -> near-identical loss trajectory; f64 suite dtype)."""
    from nf_tpu.training.manager import PWQuadManager
    from nf_tpu.training import optimizers

    def camel(x):
        return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
                + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))

    results = {}
    for layout in ("dim_major", "batch_major"):
        nf = PWQuadManager(n_flow=2, seed=11)
        nf.create_model(2, 4, [6, 6])
        nf._train_variance_forward_seq(
            camel, optimizers.adamax(2e-3), log=False, batch_size=1000,
            epochs=12, pretty_progressbar=False, mini_batch_size=1000,
            preburn_time=3, kill_counter=1000, train_layout=layout)
        results[layout] = (float(nf.best_loss), [float(h) for h in nf.history])

    l1, h1 = results["dim_major"]
    l2, h2 = results["batch_major"]
    assert l1 == pytest.approx(l2, rel=1e-6)
    np.testing.assert_allclose(h1, h2, rtol=1e-6)
