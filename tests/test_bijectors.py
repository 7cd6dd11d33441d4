"""Unit tests for coupling-cell bijectors: Jacobian exactness, range, shapes.

The reference has no tests (SURVEY.md section 4); these implement the test
strategy it implies: per-bijector forward determinism, Jacobian checked
against jax.jacfwd, outputs in [0,1].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.flows import factory, model as fmodel
from nf_tpu.bijectors import coupling, conditioner, batchnorm, permutations


def _autodiff_jacobian(transform_fn, xB):
    """Product over dims of d y_i / d x_i for an elementwise-monotone map."""
    jac = jax.vmap(jax.jacfwd(transform_fn))(xB)  # [B, T, T]
    return jnp.prod(jnp.diagonal(jac, axis1=-2, axis2=-1), axis=-1)


@pytest.mark.parametrize("n_bins,t", [(4, 1), (8, 3)])
def test_pwquad_jacobian_matches_autodiff(n_bins, t):
    key = jax.random.PRNGKey(0)
    B = 64
    kv, kw, kx = jax.random.split(key, 3)
    v_raw = jax.random.normal(kv, (B, t, n_bins + 1))
    w_raw = jax.random.normal(kw, (B, t, n_bins))
    xB = jax.random.uniform(kx, (B, t), minval=1e-4, maxval=1.0 - 1e-4)

    yB, jac = coupling.pwquad_compute(v_raw, w_raw, xB)
    assert yB.shape == (B, t)
    assert jnp.all(yB >= 0) and jnp.all(yB <= 1.0 + 1e-12)

    def per_sample(i):
        def f(x):
            y, _ = coupling.pwquad_compute(v_raw[i:i+1], w_raw[i:i+1], x[None, :])
            return y[0]
        return f

    ad = jnp.stack([
        jnp.prod(jnp.diag(jax.jacfwd(per_sample(i))(xB[i])))
        for i in range(8)
    ])
    np.testing.assert_allclose(np.asarray(jac[:8]), np.asarray(ad), rtol=1e-9)


def test_pwquad_is_monotone_cdf():
    """The transform is the CDF of a positive piecewise-linear PDF."""
    key = jax.random.PRNGKey(1)
    n_bins, t = 6, 2
    v_raw = jax.random.normal(key, (1, t, n_bins + 1))
    w_raw = jax.random.normal(jax.random.PRNGKey(2), (1, t, n_bins))
    xs = jnp.linspace(1e-6, 1 - 1e-6, 101)
    ys = jax.vmap(
        lambda x: coupling.pwquad_compute(v_raw, w_raw, jnp.full((1, t), x))[0][0]
    )(xs)
    assert jnp.all(jnp.diff(ys, axis=0) > 0)
    np.testing.assert_allclose(np.asarray(ys[0]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ys[-1]), 1.0, atol=1e-4)


def test_pwlin_jacobian_matches_autodiff():
    key = jax.random.PRNGKey(3)
    n_flow, pass_through, n_bins = 3, 1, 8
    flow, params, state = factory.build_pwlin_flow(
        key, n_flow, pass_through, 1, n_bins, (8, 8), 1, jnp.float64)
    cfg = flow.cells[0]
    B = 16
    x = jax.random.uniform(jax.random.PRNGKey(4), (B, n_flow), dtype=jnp.float64)

    y, jac, _ = fmodel.apply_cell(cfg, params[0], state[0], x, jnp.ones(B), False)
    assert jnp.all(y[:, pass_through:] >= 0) and jnp.all(y[:, pass_through:] <= 1)

    # eval mode => per-sample independence => can autodiff per sample
    def f(xi):
        yi, _, _ = fmodel.apply_cell(
            cfg, params[0], state[0], xi[None, :], jnp.ones(1), False)
        return yi[0, pass_through:]

    for i in range(4):
        full = jax.jacfwd(f)(x[i])
        ad = jnp.prod(jnp.diag(full[:, pass_through:]))
        np.testing.assert_allclose(float(jac[i]), float(ad), rtol=1e-9)


def test_affine_jacobian_single_transform_dim():
    """With transform_size == 1 the reference affine Jacobian formula is exact."""
    key = jax.random.PRNGKey(5)
    n_flow = 2
    flow, params, state = factory.build_affine_flow(
        key, n_flow, 1, 1, (6,), 1, jnp.float64)
    cfg = flow.cells[0]
    x = jax.random.uniform(jax.random.PRNGKey(6), (8, n_flow), dtype=jnp.float64)

    # the single cell (before the roll)
    y, jac, _ = fmodel.apply_cell(cfg, params[0], state[0], x, jnp.ones(8), False)

    def f(xi):
        yi, _, _ = fmodel.apply_cell(cfg, params[0], state[0], xi[None, :], jnp.ones(1), False)
        return yi[0, 1]

    for i in range(4):
        ad = jax.grad(f)(x[i])[1]
        np.testing.assert_allclose(float(jac[i]), float(ad), rtol=1e-6)


def test_flow_forward_restores_dim_order():
    """The final compensating roll restores the original ordering: a flow of
    identity-ish cells must keep pass-through info aligned (reference
    manager.py:555)."""
    total_roll = 0
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(7), 5, 2, 4, (4,), jnp.float64)
    for op in flow.ops:
        if op[0] == "roll":
            total_roll += op[1]
    assert total_roll % flow.n_flow == 0


def test_masked_flow_structure_nflow_gt_7():
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(8), 10, 2, 4, (8,), jnp.float64)
    n = len(permutations.get_bin(9, 0))  # 4 bits
    assert len(flow.cells) == 2 * n
    # every gather perm is a permutation of range(10)
    for op in flow.ops:
        if op[0] == "gather":
            assert sorted(op[1]) == list(range(10))
    # forward runs and jacobian is positive
    w = jax.random.uniform(jax.random.PRNGKey(9), (32, 10), dtype=jnp.float64)
    x, jac, _ = fmodel.forward(flow, params, state, w, False)
    assert x.shape == (32, 10)
    assert jnp.all(jac > 0)
    assert jnp.all((x >= 0) & (x <= 1))


def test_mask_partition_matches_reference_semantics():
    """feeder/trafoer from bit codes (reference layers.py:10-24)."""
    feeder, trafoer = permutations.mask_partition(10, 0)  # feed=0, bit 0 (MSB)
    codes = [permutations.get_bin(d, 4) for d in range(10)]
    exp_feed = [d for d in range(10) if codes[d][0] == 0]
    exp_trafo = [d for d in range(10) if codes[d][0] == 1]
    assert feeder.tolist() == exp_feed
    assert trafoer.tolist() == exp_trafo

    feeder1, trafoer1 = permutations.mask_partition(10, 1)  # feed=1, same bit
    assert feeder1.tolist() == exp_trafo
    assert trafoer1.tolist() == exp_feed


def test_batchnorm_torch_semantics():
    p, s = batchnorm.init(3, jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(10), (32, 3), dtype=jnp.float64) * 2 + 1
    y, s2 = batchnorm.apply(p, s, x, True)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, 0)), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jnp.var(y, 0)), 1.0, atol=1e-4)
    # running stats: momentum 0.1, unbiased var
    np.testing.assert_allclose(
        np.asarray(s2["mean"]), np.asarray(0.1 * jnp.mean(x, 0)), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s2["var"]),
        np.asarray(0.9 * 1.0 + 0.1 * jnp.var(x, 0, ddof=1)), rtol=1e-12)
    # eval mode uses running stats
    y_eval, s3 = batchnorm.apply(p, s2, x, False)
    assert s3 is s2


@pytest.mark.parametrize("build", [
    lambda k: factory.build_pwquad_flow(k, 3, 3, 6, (8,), jnp.float64),
    lambda k: factory.build_pwlin_flow(k, 4, 2, 2, 8, (8,), 1, jnp.float64),
])
def test_flow_is_measure_preserving(build):
    """The flow maps [0,1]^n onto itself bijectively, so E_w[jac] == 1
    exactly in expectation (MC check at the 5-sigma level)."""
    flow, params, state = build(jax.random.PRNGKey(20))
    n = 200_000
    w = jax.random.uniform(jax.random.PRNGKey(21), (n, flow.n_flow),
                           dtype=jnp.float64)
    _, jac, _ = fmodel.forward(flow, params, state, w, False)
    mean = float(jnp.mean(jac))
    sem = float(jnp.std(jac) / jnp.sqrt(n))
    assert abs(mean - 1.0) < 5 * sem + 1e-4


def test_forward_deterministic():
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(11), 4, 2, 6, (8, 8), jnp.float64)
    w = jax.random.uniform(jax.random.PRNGKey(12), (64, 4), dtype=jnp.float64)
    x1, j1, _ = fmodel.forward(flow, params, state, w, True)
    x2, j2, _ = fmodel.forward(flow, params, state, w, True)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
