"""Flow factories replicating the reference managers' model-building heuristics.

The cell-count auto-adjustment and the roll/mask schedules are *behavior*,
not style, so they are reproduced exactly:

  * affine chain:  reference manager.py:429-453
  * pwlin chain:   reference manager.py:474-499
  * pwquad chain:  reference manager.py:518-598 (cell-count auto-adjust at
    :526-534; roll-based chain for n_flow <= 7 at :539-557; masked binary-
    partition chain for n_flow > 7 at :559-585)
"""

from __future__ import annotations

import math

import jax

from nf_tpu.bijectors.permutations import get_bin, mask_partition
from nf_tpu.flows.model import Flow, make_cell_cfg, init_cell


def identity_init(params):
    """Zero every conditioner's FINAL layer so the flow starts as the exact
    identity map with Jacobian 1 (pwquad/pwlin: zero logits -> uniform
    bins -> y = x; affine: y = atan(20 x)/(pi/2), the closest this cell
    family gets).

    The reference initializes randomly (torch Linear defaults), which makes
    the untrained map violently non-uniform — measured J in [2e-8, 7e4] on
    a 10-D 32-bin flow, i.e. the fresh flow DESTROYS a good analytic
    channel map it is composed with (ESS 11.4% -> 0.6% before training
    starts).  Identity init makes composition with
    :mod:`nf_tpu.phasespace.mappings` / :mod:`...topology` channels
    monotone: training starts AT the channel map's ESS and improves.
    Opt-in (``create_model(..., identity_init=True)``) to keep
    reference-parity defaults.
    """
    import jax.numpy as jnp

    def zero_cell(p):
        p = dict(p)
        fin = dict(p["final"])
        if "u" in fin:
            # low-rank final: zero only v and b — grads w.r.t. v stay
            # nonzero (prop. to u^T delta), so training can leave identity
            fin["v"] = jnp.zeros_like(fin["v"])
        else:
            fin["w"] = jnp.zeros_like(fin["w"])
        fin["b"] = jnp.zeros_like(fin["b"])
        p["final"] = fin
        return p

    return tuple(zero_cell(p) for p in params)


def _init_all(key, cells, dtype):
    keys = jax.random.split(key, max(len(cells), 1))
    params, state = [], []
    for k, cfg in zip(keys, cells):
        p, s = init_cell(k, cfg, dtype)
        params.append(p)
        state.append(s)
    return tuple(params), tuple(state)


def build_affine_flow(key, n_flow, n_pass_through, n_cells, nn_layers, roll_step, dtype):
    """[AffineCoupling, Roll(roll_step)] * n_cells (reference manager.py:442-447)."""
    cells, ops = [], []
    for i in range(n_cells):
        cells.append(make_cell_cfg("affine", n_flow, n_pass_through, None, nn_layers))
        ops.append(("cell", i))
        ops.append(("roll", roll_step))
    flow = Flow(n_flow, tuple(cells), tuple(ops))
    params, state = _init_all(key, cells, dtype)
    return flow, params, state


def build_pwlin_flow(key, n_flow, n_pass_through, n_cells, n_bins, nn_layers, roll_step, dtype,
                     final_rank=None, activation="exp"):
    """[PWLin, Roll(roll_step)] * n_cells (reference manager.py:487-492)."""
    cells, ops = [], []
    for i in range(n_cells):
        cells.append(make_cell_cfg("pwlin", n_flow, n_pass_through, n_bins, nn_layers,
                                   final_rank=final_rank, activation=activation))
        ops.append(("cell", i))
        ops.append(("roll", roll_step))
    flow = Flow(n_flow, tuple(cells), tuple(ops))
    params, state = _init_all(key, cells, dtype)
    return flow, params, state


def adjust_pwquad_cells(n_flow: int, n_cells: int) -> int:
    """Reference manager.py:526-534 cell-count auto-adjustment."""
    if n_cells < 2 * math.ceil(math.log2(n_flow)) and n_cells < n_flow:
        if n_flow <= 6:
            n_cells = n_flow
        elif n_flow == 7:
            n_cells = 6
        else:
            n_cells = int(2 * math.ceil(math.log2(n_flow)))
    return n_cells


def build_pwquad_flow(key, n_flow, n_cells, n_bins, nn_layers, dtype,
                      final_rank=None, activation="exp"):
    """PWQuad chain with the reference's architecture switch at n_flow <= 7.

    ``final_rank`` / ``activation``: opt-in conditioner-cost reducers
    (see bijectors.conditioner.init / bijectors.coupling.positivity);
    defaults reproduce the reference architecture exactly.
    """
    n_cells = adjust_pwquad_cells(n_flow, n_cells)
    cells, ops = [], []

    if n_flow <= 7:
        # roll-based chain (reference manager.py:539-557)
        roll_step = 1
        n_pass_through = 1 if n_flow <= 6 else 2
        for i in range(n_cells):
            cells.append(make_cell_cfg("pwquad", n_flow, n_pass_through, n_bins, nn_layers,
                                       final_rank=final_rank, activation=activation))
            ops.append(("cell", i))
            if i < n_cells - 1:
                ops.append(("roll", roll_step))
            else:
                # compensating un-roll restoring the original dim order
                ops.append(("roll", n_flow - ((n_cells - 1) % n_flow)))
    else:
        # masked binary-partition chain (reference manager.py:559-585)
        n = len(get_bin(n_flow - 1, 0))
        for i in range(2 * n):
            feeder, trafoer = mask_partition(n_flow, i)
            perm = tuple(feeder.tolist() + trafoer.tolist())
            cells.append(make_cell_cfg("pwquad", n_flow, len(feeder), n_bins, nn_layers,
                                       final_rank=final_rank, activation=activation))
            ops.append(("gather", perm))
            ops.append(("cell", i))
            ops.append(("scatter", perm))
        # extra rolled cells if n_cells > 2n (reference manager.py:577-585)
        n_pass_through = n_flow // 2
        extra = n_cells - 2 * n
        for j in range(extra):
            cells.append(make_cell_cfg("pwquad", n_flow, n_pass_through, n_bins, nn_layers,
                                       final_rank=final_rank, activation=activation))
            ops.append(("cell", 2 * n + j))
            if j < extra - 1:
                ops.append(("roll", 1))
            else:
                ops.append(("roll", n_flow - ((extra - 1) % n_flow)))

    flow = Flow(n_flow, tuple(cells), tuple(ops))
    params, state = _init_all(key, cells, dtype)
    return flow, params, state
