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


def init(key, in_size: int, sizes: tuple[int, ...], hidden_bias: bool, dtype,
         final_rank=None):
    """Build conditioner params/state.

    ``sizes`` = hidden widths + [output size] (the reference appends the
    output width to the user's ``NN_layers`` list, coupling_cells.py:156).

    ``final_rank``: optional low-rank factorization of the final layer —
    ``out = (h @ u) @ v + b`` with ``u [prev, r]``, ``v [r, out]``.  The
    final matmul is ~80% of conditioner cost in the fused sampler (the
    output width ``transform*(2*n_bins+1)`` dwarfs the hidden widths), so
    rank r cuts its FMA count from ``prev*out`` to ``prev*r + r*out``.
    Opt-in; ``None`` reproduces the reference's dense final layer.
    """
    n_hidden = len(sizes) - 1
    keys = jax.random.split(key, n_hidden + 2)
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

    if final_rank is None:
        params["final"] = _linear_init(keys[-1], prev, sizes[-1], True, dtype)
    else:
        r = int(final_rank)
        if not 0 < r <= min(prev, sizes[-1]):
            raise ValueError(
                f"final_rank {r} outside (0, min(prev={prev}, out={sizes[-1]})]")
        u = _linear_init(keys[-2], prev, r, False, dtype)
        v = _linear_init(keys[-1], r, sizes[-1], True, dtype)
        params["final"] = {"u": u["w"], "v": v["w"], "b": v["b"]}
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
    fin = params["final"]
    if "u" in fin:
        h = jnp.dot(h, fin["u"], preferred_element_type=acc_t,
                    precision=prec).astype(x.dtype)
        out = jnp.dot(h, fin["v"], preferred_element_type=acc_t,
                      precision=prec).astype(x.dtype)
    else:
        out = jnp.dot(h, fin["w"], preferred_element_type=acc_t,
                      precision=prec).astype(x.dtype)
    out = out + fin["b"]
    return out, new_state


def apply_t(params, state, h, train: bool, axis_name=None):
    """Transposed-layout MLP: ``h`` is ``[in_size, B]`` -> ``([out, B],
    new_state)``.

    Same math as :func:`apply` with the batch in the TPU lane dimension:
    with the reference's ``[B, n]`` layout every elementwise/BN op uses only
    ``n`` of the 128 lanes (n_flow = O(10)), while here all non-matmul work
    is dense.  The lever behind the lane-efficient training forward
    (nf_tpu.flows.model.forward_t).
    """
    from nf_tpu.bijectors import batchnorm

    dtype = h.dtype
    acc_t = jnp.float32 if dtype in (jnp.float32, jnp.bfloat16) else dtype
    prec = jax.lax.Precision.HIGHEST
    new_state = {"bn_in": None, "bns": []}
    h, new_state["bn_in"] = batchnorm.apply_t(
        params["bn_in"], state["bn_in"], h, train, axis_name)
    for lin, bn_p, bn_s in zip(params["linears"], params["bns"], state["bns"]):
        h = jnp.dot(lin["w"].T, h, preferred_element_type=acc_t,
                    precision=prec).astype(dtype)
        if "b" in lin:
            h = h + lin["b"][:, None]
        h, s = batchnorm.apply_t(bn_p, bn_s, h, train, axis_name)
        new_state["bns"].append(s)
        h = jax.nn.relu(h)
    fin = params["final"]
    if "u" in fin:
        h = jnp.dot(fin["u"].T, h, preferred_element_type=acc_t,
                    precision=prec).astype(dtype)
        out = jnp.dot(fin["v"].T, h, preferred_element_type=acc_t,
                      precision=prec).astype(dtype)
    else:
        out = jnp.dot(fin["w"].T, h, preferred_element_type=acc_t,
                      precision=prec).astype(dtype)
    out = out + fin["b"][:, None]
    return out, new_state
