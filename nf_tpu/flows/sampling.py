"""Production sampler selection: fused Pallas kernel / folded XLA / stateful.

The reference's only sampling path is the stateful eager forward
(reference manager.py:388-397).  nf_tpu has three, in descending
throughput order on TPU:

  * ``fused``  — the Pallas kernel (nf_tpu.ops.pwquad_sampler): on-chip PRNG,
    folded eval-mode conditioners, one HBM write.  TPU-only (interpret mode
    elsewhere, for tests).
  * ``folded`` — jnp forward with eval-mode BatchNorm folded into the weights
    and the batch in the lane dimension (nf_tpu.flows.fast_eval).  Any
    backend.
  * ``stateful`` — the plain forward through nf_tpu.flows.model, honoring the
    train-mode BatchNorm flag (the reference-parity path).

``make_sampler`` returns a uniform interface ``fn(key) -> (x, jac)`` so the
manager endpoints (``BasicManager.sample/integrate``) and the unweighter can
auto-select the fastest correct path per backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_to_seed(key):
    """Derive an int32 seed from a jax PRNG key (typed or raw uint32)."""
    try:
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.key_data(key)
    except TypeError:
        pass
    return jax.lax.bitcast_convert_type(key.reshape(-1)[-1], jnp.int32)


def supported_by_kernel(flow) -> bool:
    return all(c.kind in ("pwquad", "pwlin", "affine") for c in flow.cells)


def default_method(flow, train=None, platform=None) -> str:
    """Pick the fastest valid sampling path.

    The fused/folded paths implement the eval-mode map (a fixed per-sample
    bijection, for which the importance-sampling estimator is exactly
    unbiased); the reference's quirk of sampling through train-mode
    BatchNorm (reference manager.py:397 never calls .eval()) is available
    as ``stateful`` with ``train=True``.  Auto-selection only considers the
    fast paths when train-mode was not explicitly requested.
    """
    if train:
        return "stateful"
    if platform is None:
        platform = jax.default_backend()
    if platform == "tpu" and supported_by_kernel(flow):
        return "fused"
    return "folded"


def make_sampler(flow, params, state, n, method="auto", train=False,
                 dtype=jnp.float32, interpret=None, jit=True):
    """Build ``fn(key) -> (x [n, n_flow], jac [n])`` drawing ``n`` samples.

    ``method``: 'auto' | 'fused' | 'folded' | 'stateful'.  ``train`` only
    affects the stateful path (BatchNorm mode).  ``interpret`` forces Pallas
    interpret mode (defaults to True off-TPU so the fused path stays
    testable anywhere).
    """
    if method == "auto":
        method = default_method(flow, train)

    if method == "fused":
        from nf_tpu.ops.pwquad_sampler import build_sampler
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if interpret:
            # the TPU PRNG primitives don't interpret on CPU: use the
            # latents-operand kernel variant fed by jax.random instead
            sampler = build_sampler(flow, params, state, interpret=True,
                                    take_latents=True)

            def fn(key):
                w = jax.random.uniform(key, (n, flow.n_flow), jnp.float32)
                return sampler(w)
        else:
            sampler = build_sampler(flow, params, state, interpret=False)

            def fn(key):
                return sampler(key_to_seed(key), n)
    elif method == "folded":
        from nf_tpu.flows.fast_eval import make_folded_forward_t
        fwd = make_folded_forward_t(flow, params, state, dtype)

        def fn(key):
            w = jax.random.uniform(key, (n, flow.n_flow), dtype)
            return fwd(w)
    elif method == "stateful":
        from nf_tpu.flows import model as fmodel

        def fn(key):
            w = jax.random.uniform(key, (n, flow.n_flow), dtype)
            x, jac, _ = fmodel.forward(flow, params, state, w, train)
            return x, jac
    else:
        raise ValueError(f"unknown sampling method {method!r}")

    return jax.jit(fn) if jit else fn
