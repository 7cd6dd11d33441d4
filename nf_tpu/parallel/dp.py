"""Explicit shard_map data-parallel loss/grad step.

The manager's default DP path uses sharding constraints and lets the SPMD
partitioner insert collectives.  This module is the hand-written equivalent
with explicit ``psum``/``pmean`` over the 'dp' axis — the collective
inventory this workload needs is exactly all-reduce (SURVEY.md section 2):

  * per-device latent shards (the batch is the scaling axis),
  * global-batch BatchNorm statistics via ``pmean`` inside the flow
    (bijectors.batchnorm.apply with ``axis_name``),
  * unbiased global variance of the weighted integrand from psum'd
    sums/sum-of-squares,
  * gradients replicated by differentiating through the collectives.

``make_dp_loss`` computes exactly the same value/gradient as the
single-device loss on the concatenated batch (tested in test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nf_tpu.flows import model as fmodel

AXIS = "dp"


def global_unbiased_var(x, axis_name=AXIS):
    """Unbiased variance of the full cross-device batch of a local [n] vector."""
    n_dev = jax.lax.psum(1, axis_name)
    n = x.shape[0] * n_dev
    s1 = jax.lax.psum(jnp.sum(x), axis_name)
    s2 = jax.lax.psum(jnp.sum(x * x), axis_name)
    return (s2 - s1 * s1 / n) / (n - 1)


def global_mean(x, axis_name=AXIS):
    return jax.lax.pmean(jnp.mean(x), axis_name)


def make_dp_loss(flow, f, mesh, maxf, loss_mode="var"):
    """Build ``loss_fn(params, bn_state, w_global) -> (loss, aux)`` where the
    forward pass, variance loss, and integral/error accumulators run under
    ``shard_map`` with explicit collectives.  ``w_global`` is the full
    [B, n_flow] latent batch (sharded over its leading axis by the runtime).
    Differentiable in ``params``.
    """

    def shard_fn(params, bn_state, w):
        x, jacv, new_bn = fmodel.forward(flow, params, bn_state, w, True,
                                         axis_name=AXIS)
        x_fixed = jax.lax.stop_gradient(x)
        fres = f(x_fixed) * jacv
        fXJ = fres / maxf
        if loss_mode == "var":
            loss = global_unbiased_var(fXJ)
        else:
            loss = global_mean((fXJ * maxf) ** 2)
        fres_d = jax.lax.stop_gradient(fres)
        integ_inc = global_mean(fres_d)
        err_inc = global_unbiased_var(fres_d)
        return loss, (new_bn, integ_inc, err_inc)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS)),
        out_specs=(P(), (P(), P(), P())),
    )

    def loss_fn(params, bn_state, w):
        return sharded(params, bn_state, w)

    return loss_fn


def make_dp_train_step(flow, f, mesh, maxf, optimizer, loss_mode="var"):
    """Jitted full train step: value_and_grad through the shard_map'd loss,
    then an optax update (params replicated, grads already all-reduced by
    differentiation through psum)."""
    loss_fn = make_dp_loss(flow, f, mesh, maxf, loss_mode)

    @jax.jit
    def step(params, bn_state, opt_state, w):
        (loss, (new_bn, integ_inc, err_inc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bn_state, w)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, loss, integ_inc, err_inc

    return step
