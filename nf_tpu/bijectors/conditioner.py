"""Coupling-cell conditioner MLPs (the "RectNN" of the reference).

Structure (reference coupling_cells.py:230-254 for PWQuad/PWLin,
coupling_cells.py:21-47 for the affine variant):

    BatchNorm(in) -> Linear(in, h0) -> BatchNorm -> ReLU
                  -> [Linear(h_i, h_{i+1}) -> BatchNorm -> ReLU]*
                  -> Linear(h_last, out)          # always with bias
                  -> reshape [B, r0, r1]

PWQuad/PWLin hidden linears are bias-free; the affine cell's carry biases.
Initialization follows torch.nn.Linear defaults (kaiming-uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias)
so trained behavior is statistically comparable to the reference.

All matmuls request ``preferred_element_type`` so the MXU accumulates in f32
even when parameters are bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nf_tpu.bijectors import batchnorm


def _linear_init(key, fan_in: int, fan_out: int, bias: bool, dtype):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float64 if dtype == jnp.float64 else jnp.float32))
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype=dtype, minval=-bound, maxval=bound)
    layer = {"w": w}
    if bias:
        layer["b"] = jax.random.uniform(kb, (fan_out,), dtype=dtype, minval=-bound, maxval=bound)
    return layer


def init(key, in_size: int, sizes: tuple[int, ...], hidden_bias: bool, dtype):
    """Build conditioner params/state.

    ``sizes`` = hidden widths + [output size] (the reference appends the
    output width to the user's ``NN_layers`` list, coupling_cells.py:156).
    """
    n_hidden = len(sizes) - 1
    keys = jax.random.split(key, n_hidden + 1)
    params = {"linears": [], "bns": [], "final": None}
    state = {"bn_in": None, "bns": []}

    bn_p, bn_s = batchnorm.init(in_size, dtype)
    params["bn_in"] = bn_p
    state["bn_in"] = bn_s

    prev = in_size
    for i in range(n_hidden):
        params["linears"].append(_linear_init(keys[i], prev, sizes[i], hidden_bias, dtype))
        bn_p, bn_s = batchnorm.init(sizes[i], dtype)
        params["bns"].append(bn_p)
        state["bns"].append(bn_s)
        prev = sizes[i]

    params["final"] = _linear_init(keys[-1], prev, sizes[-1], True, dtype)
    return params, state


def apply(params, state, x, train: bool, axis_name=None):
    """Run the MLP on ``x`` [B, in_size] -> ([B, out_size], new_state).

    ``axis_name``: optional shard_map axis for global-batch BatchNorm.
    """
    acc_t = jnp.float32 if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype
    new_state = {"bn_in": None, "bns": []}
    h, new_state["bn_in"] = batchnorm.apply(params["bn_in"], state["bn_in"], x, train, axis_name)
    # HIGHEST: TPU f32 matmuls otherwise run as bf16 MXU passes; the ~1e-3
    # error shifts conditioner outputs enough to matter through sharp
    # trained CDFs (and would break kernel-vs-jnp exactness)
    prec = jax.lax.Precision.HIGHEST
    for lin, bn_p, bn_s in zip(params["linears"], params["bns"], state["bns"]):
        h = jnp.dot(h, lin["w"], preferred_element_type=acc_t,
                    precision=prec).astype(x.dtype)
        if "b" in lin:
            h = h + lin["b"]
        h, s = batchnorm.apply(bn_p, bn_s, h, train, axis_name)
        new_state["bns"].append(s)
        h = jax.nn.relu(h)
    out = jnp.dot(h, params["final"]["w"], preferred_element_type=acc_t,
                  precision=prec).astype(x.dtype)
    out = out + params["final"]["b"]
    return out, new_state
