"""Flow model: a static plan of ops over ``(x, jac)`` plus params/state pytrees.

The reference builds ``torch.nn.Sequential`` chains over a packed
``[B, n_flow+1]`` tensor whose last column is the running Jacobian
(reference manager.py:439-453,484-499,538-598).  Here the model is:

  * ``Flow`` — a hashable static description (cells + op sequence), safe to
    close over in jitted functions;
  * ``params`` / ``state`` — tuples of per-cell pytrees (state = BatchNorm
    running statistics).

``forward`` composes the ops, carrying ``(x, jac)`` explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from nf_tpu.bijectors import conditioner, coupling


@dataclasses.dataclass(frozen=True)
class CellCfg:
    kind: str                      # 'affine' | 'pwlin' | 'pwquad'
    flow_size: int
    pass_through: int
    n_bins: Optional[int]          # None for affine
    nn_sizes: tuple                # hidden widths + output width
    hidden_bias: bool              # affine cells: True; PW cells: False
    # opt-in conditioner-cost reducers (VERDICT r3 #2; defaults reproduce
    # the reference architecture exactly):
    final_rank: Optional[int] = None   # low-rank factored final layer
    activation: str = "exp"            # bin-logit positivity map
                                       # ('exp' | 'squareplus')


@dataclasses.dataclass(frozen=True)
class Flow:
    """Static flow description.

    ``ops`` is a tuple of
      ('cell', cell_index)        -- apply coupling cell
      ('roll', shift)             -- cyclic shift of dims (reference RollLayer)
      ('gather', perm_tuple)      -- reorder dims to (pass_through || transform)
      ('scatter', perm_tuple)     -- inverse reorder (reference DeMaskLayer)
    """
    n_flow: int
    cells: tuple  # tuple[CellCfg]
    ops: tuple


def make_cell_cfg(kind, flow_size, pass_through, n_bins, nn_layers,
                  final_rank=None, activation="exp") -> CellCfg:
    transform = flow_size - pass_through
    if kind == "affine":
        out = 2 * transform
        hidden_bias = True
        n_bins = None
        if activation != "exp":
            raise ValueError("affine cells use exp scales (reference "
                             "coupling_cells.py:56); activation applies to "
                             "pwlin/pwquad bin logits only")
    elif kind == "pwlin":
        out = transform * n_bins
        hidden_bias = False
    elif kind == "pwquad":
        out = transform * (2 * n_bins + 1)
        hidden_bias = False
    else:
        raise ValueError(f"unknown cell kind {kind!r}")
    if activation not in ("exp", "squareplus"):
        raise ValueError(f"unknown activation {activation!r}")
    return CellCfg(kind, flow_size, pass_through, n_bins,
                   tuple(nn_layers) + (out,), hidden_bias,
                   final_rank=final_rank, activation=activation)


def init_cell(key, cfg: CellCfg, dtype):
    return conditioner.init(key, cfg.pass_through, cfg.nn_sizes, cfg.hidden_bias,
                            dtype, final_rank=cfg.final_rank)


def apply_cell(cfg: CellCfg, params, state, x, jac, train: bool, axis_name=None):
    if cfg.kind == "affine":
        return coupling.affine_forward(params, state, x, jac, cfg.pass_through,
                                       train, axis_name)
    if cfg.kind == "pwlin":
        return coupling.pwlin_forward(params, state, x, jac, cfg.pass_through,
                                      cfg.n_bins, train, axis_name,
                                      act=cfg.activation)
    return coupling.pwquad_forward(params, state, x, jac, cfg.pass_through,
                                   cfg.n_bins, train, axis_name,
                                   act=cfg.activation)


def forward(flow: Flow, params, state, w, train: bool, axis_name=None):
    """Map latent points ``w`` [B, n_flow] -> ``(x, jac, new_state)``.

    ``jac`` starts at 1 (the reference's AddJacobian, layers.py:66-77) and is
    multiplied by each cell's factor.  ``axis_name``: optional shard_map axis
    for global-batch BatchNorm statistics (see bijectors.batchnorm.apply).
    """
    x = w
    jac = jnp.ones((w.shape[0],), dtype=w.dtype)
    new_state = list(state)
    for op in flow.ops:
        tag = op[0]
        if tag == "cell":
            idx = op[1]
            cfg = flow.cells[idx]
            x, jac, new_state[idx] = apply_cell(cfg, params[idx], state[idx], x, jac, train, axis_name)
        elif tag == "roll":
            x = jnp.roll(x, op[1], axis=-1)
        elif tag == "gather":
            x = x[:, np.asarray(op[1])]
        elif tag == "scatter":
            inv = np.empty(len(op[1]), dtype=np.int64)
            inv[np.asarray(op[1])] = np.arange(len(op[1]))
            x = x[:, inv]
        else:
            raise ValueError(f"unknown op {tag!r}")
    return x, jac, tuple(new_state)


def apply_cell_t(cfg: CellCfg, params, state, x, jac, train: bool, axis_name=None):
    if cfg.kind == "affine":
        return coupling.affine_forward_t(params, state, x, jac,
                                         cfg.pass_through, train, axis_name)
    if cfg.kind == "pwlin":
        return coupling.pwlin_forward_t(params, state, x, jac,
                                        cfg.pass_through, cfg.n_bins, train,
                                        axis_name, act=cfg.activation)
    return coupling.pwquad_forward_t(params, state, x, jac, cfg.pass_through,
                                     cfg.n_bins, train, axis_name,
                                     act=cfg.activation)


def forward_t(flow: Flow, params, state, w, train: bool, axis_name=None):
    """Lane-efficient :func:`forward`: internally ``[n_flow, B]`` layout.

    Same math and same ``(x [B, n_flow], jac, new_state)`` contract as
    :func:`forward` (bit-differences only from reduction order), but with
    the batch in the TPU lane dimension every elementwise / cumsum /
    BatchNorm op — and their VJPs under autodiff — is dense VPU work
    instead of using n_flow of 128 lanes.  This is the training hot path
    (the eval paths get the same treatment from
    fast_eval.make_folded_forward_t and the Pallas kernel).
    """
    x = w.T
    jac = jnp.ones((x.shape[1],), dtype=x.dtype)
    new_state = list(state)
    for op in flow.ops:
        tag = op[0]
        if tag == "cell":
            idx = op[1]
            cfg = flow.cells[idx]
            x, jac, new_state[idx] = apply_cell_t(
                cfg, params[idx], state[idx], x, jac, train, axis_name)
        elif tag == "roll":
            x = jnp.roll(x, op[1], axis=0)
        elif tag == "gather":
            x = x[np.asarray(op[1])]
        elif tag == "scatter":
            inv = np.empty(len(op[1]), dtype=np.int64)
            inv[np.asarray(op[1])] = np.arange(len(op[1]))
            x = x[inv]
        else:
            raise ValueError(f"unknown op {tag!r}")
    return x.T, jac, tuple(new_state)


def apply_cell_inverse(cfg: CellCfg, params, state, y, jac, train: bool = False):
    if cfg.kind == "affine":
        return coupling.affine_inverse(params, state, y, jac, cfg.pass_through, train)
    if cfg.kind == "pwlin":
        return coupling.pwlin_inverse(params, state, y, jac, cfg.pass_through,
                                      cfg.n_bins, train, act=cfg.activation)
    return coupling.pwquad_inverse(params, state, y, jac, cfg.pass_through,
                                   cfg.n_bins, train, act=cfg.activation)


def inverse(flow: Flow, params, state, x, train: bool = False):
    """Map phase-space-side points ``x`` back to latent ``(w, jac_inv)``.

    The inverse of :func:`forward`: ops run in reverse with rolls negated and
    gather/scatter swapped.  ``jac_inv`` is the Jacobian of the inverse map
    (reciprocal of the forward Jacobian at the recovered point).  Completes
    the reference's unimplemented inversion TODO (reference README.md:69).
    Eval-mode conditioners by default so the map is a fixed bijection.
    """
    y = x
    jac = jnp.ones((x.shape[0],), dtype=x.dtype)
    new_state = list(state)
    for op in reversed(flow.ops):
        tag = op[0]
        if tag == "cell":
            idx = op[1]
            cfg = flow.cells[idx]
            y, jac, new_state[idx] = apply_cell_inverse(
                cfg, params[idx], state[idx], y, jac, train)
        elif tag == "roll":
            y = jnp.roll(y, -op[1], axis=-1)
        elif tag == "gather":
            # undo the gather: scatter back
            inv_perm = np.empty(len(op[1]), dtype=np.int64)
            inv_perm[np.asarray(op[1])] = np.arange(len(op[1]))
            y = y[:, inv_perm]
        elif tag == "scatter":
            # undo the scatter: gather
            y = y[:, np.asarray(op[1])]
        else:
            raise ValueError(f"unknown op {tag!r}")
    return y, jac, tuple(new_state)
