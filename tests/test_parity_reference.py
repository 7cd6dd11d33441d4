"""Golden-value parity tests against the PyTorch reference.

The reference package (nisrep) is imported from its read-only mount and run
on CPU; its parameters are transplanted into nf_tpu's pytrees and both
implementations are evaluated on identical inputs.  This pins the math —
coupling transforms, Jacobian accumulation, masks/rolls, and the phase-space
map — to the reference bit-for-bit (up to f64 roundoff).

Skipped automatically when the reference mount or torch is unavailable.
"""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")
nisrep_manager = pytest.importorskip("nisrep.normalizing_flows.manager")
nisrep_ps = pytest.importorskip("nisrep.PhaseSpace.flat_phase_space_generator")

from nf_tpu.flows import factory, model as fmodel  # noqa: E402
from nf_tpu.phasespace import FlatInvertiblePhasespace  # noqa: E402


def _torch_conditioner_to_params(seq):
    """Convert a reference conditioner Sequential into nf_tpu param/state dicts.

    Layout (reference coupling_cells.py:230-254): BatchNorm, Linear(nb),
    BatchNorm, ReLU, [Linear(nb), BatchNorm, ReLU]*, Linear, Reshape.
    """
    import torch.nn as nn

    mods = list(seq)
    assert isinstance(mods[0], nn.BatchNorm1d)
    params = {"bn_in": None, "linears": [], "bns": [], "final": None}
    state = {"bn_in": None, "bns": []}

    def bn(m):
        p = {"scale": jnp.asarray(m.weight.detach().numpy(), jnp.float64),
             "bias": jnp.asarray(m.bias.detach().numpy(), jnp.float64)}
        s = {"mean": jnp.asarray(m.running_mean.detach().numpy(), jnp.float64),
             "var": jnp.asarray(m.running_var.detach().numpy(), jnp.float64)}
        return p, s

    params["bn_in"], state["bn_in"] = bn(mods[0])
    i = 1
    linears = []
    while i < len(mods):
        m = mods[i]
        if isinstance(m, nn.Linear):
            linears.append(m)
        i += 1
    # all but the last linear are hidden (each followed by BN+ReLU)
    bn_mods = [m for m in mods[1:] if isinstance(m, nn.BatchNorm1d)]
    for lin, bnm in zip(linears[:-1], bn_mods):
        layer = {"w": jnp.asarray(lin.weight.detach().numpy().T, jnp.float64)}
        if lin.bias is not None:
            layer["b"] = jnp.asarray(lin.bias.detach().numpy(), jnp.float64)
        params["linears"].append(layer)
        p, s = bn(bnm)
        params["bns"].append(p)
        state["bns"].append(s)
    fin = linears[-1]
    params["final"] = {"w": jnp.asarray(fin.weight.detach().numpy().T, jnp.float64),
                       "b": jnp.asarray(fin.bias.detach().numpy(), jnp.float64)}
    return params, state


def _transplant_pwquad(torch_manager, flow):
    """Pull every PWQuad cell's conditioner out of the torch Sequential in
    order and convert to nf_tpu params."""
    cells = [m for m in torch_manager._model
             if type(m).__name__ == "PWQuad"]
    assert len(cells) == len(flow.cells)
    params, state = [], []
    for c in cells:
        p, s = _torch_conditioner_to_params(c.NN)
        params.append(p)
        state.append(s)
    return tuple(params), tuple(state)


@pytest.mark.parametrize("n_flow,n_cells,n_bins,NN", [
    (2, 2, 4, [3, 3, 3]),
    (4, 2, 6, [8, 8]),     # auto-adjusts to 4 cells
    (7, 2, 4, [5]),        # auto-adjusts to 6 cells, pass_through=2
])
def test_pwquad_flow_forward_parity(n_flow, n_cells, n_bins, NN):
    torch.manual_seed(0)
    TM = nisrep_manager.PWQuadManager(n_flow=n_flow)
    TM.create_model(n_cells, n_bins, NN)

    flow, _, _ = factory.build_pwquad_flow(
        jax.random.PRNGKey(0), n_flow, n_cells, n_bins, tuple(NN), jnp.float64)
    params, state = _transplant_pwquad(TM, flow)

    B = 64
    w_np = np.random.RandomState(1).uniform(size=(B, n_flow))
    w_t = torch.tensor(w_np, dtype=torch.double)

    # eval mode: BN uses running stats on both sides
    TM._model.eval()
    with torch.no_grad():
        out_t = TM._model(TM.format_input(w_t, torch.device("cpu")))
    x_j, jac_j, _ = fmodel.forward(flow, params, state, jnp.asarray(w_np), False)

    np.testing.assert_allclose(np.asarray(x_j), out_t[:, :-1].numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jac_j), out_t[:, -1].numpy(), rtol=1e-10)

    # train mode: BN uses batch statistics
    TM._model.train()
    with torch.no_grad():
        out_t = TM._model(TM.format_input(w_t, torch.device("cpu")))
    x_j, jac_j, _ = fmodel.forward(flow, params, state, jnp.asarray(w_np), True)
    np.testing.assert_allclose(np.asarray(x_j), out_t[:, :-1].numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jac_j), out_t[:, -1].numpy(), rtol=1e-10)


def test_pwquad_masked_flow_parity_nflow_10():
    n_flow, n_cells, n_bins, NN = 10, 2, 4, [16]
    torch.manual_seed(2)
    TM = nisrep_manager.PWQuadManager(n_flow=n_flow)
    TM.create_model(n_cells, n_bins, NN)

    flow, _, _ = factory.build_pwquad_flow(
        jax.random.PRNGKey(0), n_flow, n_cells, n_bins, tuple(NN), jnp.float64)
    params, state = _transplant_pwquad(TM, flow)

    B = 32
    w_np = np.random.RandomState(3).uniform(size=(B, n_flow))
    w_t = torch.tensor(w_np, dtype=torch.double)
    TM._model.eval()
    with torch.no_grad():
        out_t = TM._model(TM.format_input(w_t, torch.device("cpu")))
    x_j, jac_j, _ = fmodel.forward(flow, params, state, jnp.asarray(w_np), False)
    np.testing.assert_allclose(np.asarray(x_j), out_t[:, :-1].numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jac_j), out_t[:, -1].numpy(), rtol=1e-10)


def test_pwlin_flow_forward_parity():
    """PWLin cell + roll chain vs the reference modules.

    Built manually (not via the reference PWLinManager) for two reasons:
    the reference manager registers every RollLayer under the same module
    name so only one survives in the Sequential (quirk at reference
    manager.py:492 — nf_tpu deliberately fixes this and rolls after every
    cell), and it never casts the model to double (manager.py:493) so its
    own f64 warm-up crashes on modern torch.
    """
    from nisrep.normalizing_flows.layers.coupling_cells import PWLin
    from nisrep.normalizing_flows.layers.layers import RollLayer, AddJacobian

    n_flow, n_pass, n_cells, n_bins, NN = 4, 2, 3, 8, [8, 8]
    torch.manual_seed(4)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        mods = []
        for i in range(n_cells):
            mods.append(PWLin(flow_size=n_flow, pass_through_size=n_pass,
                              n_bins=n_bins, NN_layers=list(NN)))
            mods.append(RollLayer(1))
        tmodel = torch.nn.Sequential(*mods).to(torch.double)
    finally:
        torch.set_default_dtype(prev)

    flow, _, _ = factory.build_pwlin_flow(
        jax.random.PRNGKey(0), n_flow, n_pass, n_cells, n_bins, tuple(NN), 1,
        jnp.float64)
    cells = [m for m in tmodel if type(m).__name__ == "PWLin"]
    params, state = [], []
    for c in cells:
        p, s = _torch_conditioner_to_params(c.NN)
        params.append(p)
        state.append(s)
    params, state = tuple(params), tuple(state)

    B = 64
    w_np = np.random.RandomState(5).uniform(size=(B, n_flow))
    w_t = torch.tensor(w_np, dtype=torch.double)
    tmodel.eval()
    with torch.no_grad():
        out_t = tmodel(AddJacobian()(w_t, torch.device("cpu")))
    x_j, jac_j, _ = fmodel.forward(flow, params, state, jnp.asarray(w_np), False)
    np.testing.assert_allclose(np.asarray(x_j), out_t[:, :-1].numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jac_j), out_t[:, -1].numpy(), rtol=1e-10)


# ---------------------------------------------------------------------------
# Phase-space parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("masses,cuts", [
    ([0.0, 0.0], {}),
    ([100.0, 200.0], {}),
    ([50.0, 50.0, 50.0], {}),
    ([0.0, 0.0, 0.0, 0.0], dict(pT_mincut=50.0, delR_mincut=0.4, rap_maxcut=2.4)),
    ([173.0, 4.7, 0.0, 80.4], dict(pT_mincut=20.0, delR_mincut=0.2, rap_maxcut=3.0)),
])
def test_phase_space_parity(masses, cuts):
    E_cm = 1000.0
    ref = nisrep_ps.FlatInvertiblePhasespace([0.0, 0.0], masses,
                                             pdf=None, pdf_active=False)
    mine = FlatInvertiblePhasespace([0.0, 0.0], masses,
                                    pdf=None, pdf_active=False)
    B = 256
    rv_np = np.random.RandomState(6).uniform(size=(B, mine.nDimPhaseSpace()))
    mom_t, wgt_t = ref.generateKinematics_batch(
        E_cm, torch.tensor(rv_np, dtype=torch.double), **cuts)
    mom_j, wgt_j = mine.generateKinematics_batch(E_cm, jnp.asarray(rv_np), **cuts)

    np.testing.assert_allclose(np.asarray(mom_j), mom_t.numpy(),
                               atol=1e-8, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(wgt_j), wgt_t.numpy(), rtol=1e-9)


def test_phase_space_parity_pdf_tau_mode():
    """tau-mode PDF convolution math vs reference, with pdf=None (the PDF
    weight itself is 1; tests the tau/ycm mapping, E_cm reduction, lab boost,
    and flux factor).  pdf_active is enabled post-construction to dodge the
    reference's lhapdf import (flat_phase_space_generator.py:37-39)."""
    E_cm = 1000.0
    masses = [91.0, 91.0]
    ref = nisrep_ps.FlatInvertiblePhasespace([0.0, 0.0], masses,
                                             pdf=None, pdf_active=False)
    ref.pdf_active = True
    ref.tau = True
    mine = FlatInvertiblePhasespace([0.0, 0.0], masses,
                                    pdf=None, pdf_active=True, tau=True)
    B = 256
    rv_np = np.random.RandomState(7).uniform(size=(B, mine.nDimPhaseSpace() + 2))
    mom_t, wgt_t = ref.generateKinematics_batch(
        E_cm, torch.tensor(rv_np, dtype=torch.double))
    mom_j, wgt_j = mine.generateKinematics_batch(E_cm, jnp.asarray(rv_np))
    np.testing.assert_allclose(np.asarray(mom_j), mom_t.numpy(),
                               atol=1e-7, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(wgt_j), wgt_t.numpy(), rtol=1e-8)


def test_phase_space_parity_pdf_direct_x_mode():
    E_cm = 1000.0
    masses = [10.0, 10.0, 10.0]
    ref = nisrep_ps.FlatInvertiblePhasespace([0.0, 0.0], masses,
                                             pdf=None, pdf_active=False)
    ref.pdf_active = True
    ref.tau = False
    mine = FlatInvertiblePhasespace([0.0, 0.0], masses,
                                    pdf=None, pdf_active=True, tau=False)
    B = 256
    rv_np = np.random.RandomState(8).uniform(size=(B, mine.nDimPhaseSpace() + 2))
    # keep xb away from the 1e-4 zero-cut for a clean comparison
    rv_np[:, -2:] = 0.3 + 0.6 * rv_np[:, -2:]
    mom_t, wgt_t = ref.generateKinematics_batch(
        E_cm, torch.tensor(rv_np, dtype=torch.double))
    mom_j, wgt_j = mine.generateKinematics_batch(E_cm, jnp.asarray(rv_np))
    np.testing.assert_allclose(np.asarray(mom_j), mom_t.numpy(),
                               atol=1e-7, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(wgt_j), wgt_t.numpy(), rtol=1e-8)
