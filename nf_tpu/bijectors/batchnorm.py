"""Functional BatchNorm1d with torch-compatible semantics.

The reference conditioners interleave ``torch.nn.BatchNorm1d`` between linear
layers (reference coupling_cells.py:236-245).  Torch semantics replicated here:

  * train mode: normalize with the batch mean and the *biased* batch variance;
    update running stats with momentum 0.1 where ``running_var`` tracks the
    *unbiased* batch variance.
  * eval mode: normalize with the running stats.
  * eps = 1e-5.

State is explicit: ``(params, state)`` pytrees threaded through ``apply``.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1


def init(n: int, dtype) -> tuple[dict, dict]:
    """Parameters (scale/bias) and running statistics for ``n`` features."""
    params = {
        "scale": jnp.ones((n,), dtype=dtype),
        "bias": jnp.zeros((n,), dtype=dtype),
    }
    state = {
        "mean": jnp.zeros((n,), dtype=dtype),
        "var": jnp.ones((n,), dtype=dtype),
    }
    return params, state


def apply(params, state, x, train: bool, axis_name=None):
    """Normalize ``x`` of shape ``[B, n]``; returns ``(y, new_state)``.

    Under ``shard_map`` pass ``axis_name`` to compute *global-batch*
    statistics with ``pmean`` collectives over the device axis, so
    data-parallel training matches single-device math exactly.
    """
    if train:
        import jax

        mean = jnp.mean(x, axis=0)
        sq = jnp.mean(x * x, axis=0)
        n = x.shape[0]
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            sq = jax.lax.pmean(sq, axis_name)
            n = n * jax.lax.psum(1, axis_name)
        var = sq - mean * mean  # biased, used for normalization
        # torch tracks the unbiased variance in running_var
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1.0 - MOMENTUM) * state["mean"] + MOMENTUM * mean,
            "var": (1.0 - MOMENTUM) * state["var"] + MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jnp.reciprocal(jnp.sqrt(var + EPS))
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y, new_state


def apply_t(params, state, h, train: bool, axis_name=None):
    """Transposed-layout BatchNorm: ``h`` is ``[n, B]`` (features in
    sublanes, batch in lanes).  Same torch semantics as :func:`apply`;
    reductions run over axis 1.  Used by the lane-efficient training
    forward (nf_tpu.flows.model.forward_t)."""
    if train:
        import jax

        mean = jnp.mean(h, axis=1)
        sq = jnp.mean(h * h, axis=1)
        n = h.shape[1]
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            sq = jax.lax.pmean(sq, axis_name)
            n = n * jax.lax.psum(1, axis_name)
        var = sq - mean * mean
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1.0 - MOMENTUM) * state["mean"] + MOMENTUM * mean,
            "var": (1.0 - MOMENTUM) * state["var"] + MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jnp.reciprocal(jnp.sqrt(var + EPS))
    y = (h - mean[:, None]) * inv[:, None] * params["scale"][:, None] \
        + params["bias"][:, None]
    return y, new_state
