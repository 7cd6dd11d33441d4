"""Explicit shard_map DP step vs single-device math.

The shard_map path (nf_tpu.parallel.dp) uses hand-written psum/pmean
collectives including global-batch BatchNorm; on the same latent batch it
must produce the same loss, gradients, and accumulators as the plain
single-device computation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nf_tpu.flows import factory, model as fmodel
from nf_tpu.parallel import make_mesh, make_dp_loss, make_dp_train_step
from nf_tpu.training import optimizers


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def _single_device_loss(flow, f, maxf, params, bn_state, w):
    x, jacv, new_bn = fmodel.forward(flow, params, bn_state, w, True)
    fres = f(jax.lax.stop_gradient(x)) * jacv
    fXJ = fres / maxf
    return jnp.var(fXJ, ddof=1), new_bn


def test_shard_map_loss_and_grad_match_single_device():
    mesh = make_mesh()
    # small flow + jitted grads: this is an equivalence test, and the cost
    # is compile time of grad-through-shard_map on 8 fake devices
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(0), 2, 2, 2, (3,), jnp.float64)
    maxf = jnp.asarray(2.0)
    w = jax.random.uniform(jax.random.PRNGKey(1), (256, 2), dtype=jnp.float64)

    dp_loss = make_dp_loss(flow, camel, mesh, maxf)
    (loss_dp, (bn_dp, integ_dp, err_dp)), grads_dp = jax.jit(
        jax.value_and_grad(dp_loss, has_aux=True))(params, state, w)

    (loss_1, bn_1), grads_1 = jax.jit(jax.value_and_grad(
        lambda p: _single_device_loss(flow, camel, maxf, p, state, w),
        has_aux=True))(params)

    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(grads_dp), jax.tree.leaves(grads_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)
    # BatchNorm running stats from global-batch statistics match too
    # (atol covers stats that are zero up to cross-shard summation order)
    for a, b in zip(jax.tree.leaves(bn_dp), jax.tree.leaves(bn_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-14)

    x, jacv, _ = fmodel.forward(flow, params, state, w, True)
    fres = camel(x) * jacv
    np.testing.assert_allclose(float(integ_dp), float(jnp.mean(fres)), rtol=1e-10)
    np.testing.assert_allclose(float(err_dp), float(jnp.var(fres, ddof=1)), rtol=1e-10)


def test_shard_map_train_step_updates_params():
    mesh = make_mesh()
    flow, params, state = factory.build_pwquad_flow(
        jax.random.PRNGKey(2), 2, 2, 4, (4,), jnp.float64)
    opt = optimizers.adamax(1e-3)
    step = make_dp_train_step(flow, camel, mesh, jnp.asarray(2.0), opt)
    opt_state = opt.init(params)
    w = jax.random.uniform(jax.random.PRNGKey(3), (256, 2), dtype=jnp.float64)
    p2, bn2, opt_state, loss, integ, err = step(params, state, opt_state, w)
    assert jnp.isfinite(loss)
    # params actually moved
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)))
    assert moved
