"""LHAPDF6 .dat grid reader + log-bicubic interpolation vs the analytic
function the bundled fixture was sampled from (tools/make_pdf_fixture.py).
Mirrors the reference's real-LHAPDF call path
(reference flat_phase_space_generator.py:120-137) without the lhapdf wheel."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf_tpu.phasespace.lhapdf_reader import LHAPDFGrid, read_lhapdf_dat

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "toypdf_0000.dat")

PARAMS = {
    21: (3.0, -0.2, 5.0, 0.08),
    1: (0.7, 0.5, 4.0, 0.05),
    2: (1.4, 0.5, 3.0, 0.05),
    -1: (0.2, -0.1, 6.0, 0.06),
    -2: (0.15, -0.1, 6.0, 0.06),
}


def xf_exact(pdg, x, q2):
    A, a, b, c = PARAMS[pdg]
    return A * x ** a * (1.0 - x) ** b * (1.0 + c * np.log(q2))


@pytest.fixture(scope="module")
def grid():
    return LHAPDFGrid.from_dat(FIXTURE)


def test_parse_structure():
    meta, subgrids = read_lhapdf_dat(FIXTURE)
    assert meta["Format"] == "lhagrid1"
    assert meta["PdfType"] == "central"
    assert len(subgrids) == 2
    xs, qs, flavors, vals = subgrids[0]
    assert vals.shape == (len(xs), len(qs), len(flavors))
    assert list(flavors) == [-2, -1, 21, 1, 2]
    # subgrids share the Q boundary knot
    assert subgrids[0][1][-1] == subgrids[1][1][0] == 10.0


def test_values_exact_at_knots(grid):
    _, subgrids = read_lhapdf_dat(FIXTURE)
    xs, qs, flavors, vals = subgrids[1]
    # interior knots of the second subgrid: interpolation must reproduce the
    # *stored* values exactly (and the analytic form to the 8-significant-
    # digit precision the fixture was written with)
    xi = np.arange(5, 40, 7)
    qi = np.arange(3, 20, 5)
    for pdg in (21, 2, -1):
        fcol = list(flavors).index(pdg)
        for j in qi:
            q = qs[j]
            got = np.asarray(grid.xfxQ2(pdg, jnp.asarray(xs[xi]), q * q))
            np.testing.assert_allclose(got, vals[xi, j, fcol], rtol=1e-12)
            np.testing.assert_allclose(got, xf_exact(pdg, xs[xi], q * q),
                                       rtol=1e-7)


def test_offknot_interpolation_accuracy(grid):
    rng = np.random.default_rng(0)
    x = rng.uniform(1e-3, 0.85, 512)
    q2 = np.exp(rng.uniform(np.log(2.0), np.log(1e5), 512))
    for pdg in PARAMS:
        got = np.asarray(grid.xfxQ2(pdg, jnp.asarray(x), jnp.asarray(q2)))
        want = xf_exact(pdg, x, q2)
        # knot values are pinned exactly elsewhere; off-knot error is the
        # cubic truncation of the fixture's grid density (~0.5% worst-case
        # in the steep (1-x)^b region)
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-6)


def test_subgrid_boundary_continuity(grid):
    x = jnp.asarray([1e-3, 1e-2, 0.1, 0.5])
    below = np.asarray(grid.xfxQ2(21, x, (10.0 - 1e-9) ** 2))
    above = np.asarray(grid.xfxQ2(21, x, (10.0 + 1e-9) ** 2))
    np.testing.assert_allclose(below, above, rtol=1e-6)


def test_out_of_range_clamps(grid):
    v_lo = np.asarray(grid.xfxQ2(2, jnp.asarray([1e-8]), 100.0))
    v_edge = np.asarray(grid.xfxQ2(2, jnp.asarray([1e-5]), 100.0))
    np.testing.assert_allclose(v_lo, v_edge, rtol=1e-12)


def test_jittable_and_in_phase_space_generator(grid):
    @jax.jit
    def f(x, q2):
        return grid.xfxQ2(21, x, q2)

    x = jnp.asarray([1e-3, 0.3])
    np.testing.assert_allclose(np.asarray(f(x, 91.188 ** 2)),
                               np.asarray(grid.xfxQ2(21, x, 91.188 ** 2)),
                               rtol=1e-12)

    from nf_tpu.phasespace import FlatInvertiblePhasespace
    gen = FlatInvertiblePhasespace([0.0, 0.0], [10.0, 10.0, 0.0],
                                   pdf=grid, pdf_active=True)
    rv = jax.random.uniform(jax.random.PRNGKey(0),
                            (256, gen.nDimPhaseSpace() + 2))
    momenta, wgt = gen.generateKinematics_batch(1000.0, rv, pdgs=[21, 21])
    wgt = np.asarray(wgt)
    assert np.isfinite(wgt).all()
    assert (wgt >= 0).all() and wgt.max() > 0
