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

Q_BOUNDARY = 10.0
M_C = np.sqrt(2.0)
M_B = 4.75


def xf_exact(pdg, x, q2):
    """The analytic form the fixture was sampled from
    (tools/make_pdf_fixture.py — incl. the adversarial flavors)."""
    x = np.asarray(x, dtype=np.float64)
    q2 = np.asarray(q2, dtype=np.float64)
    if pdg == 3:
        c = 0.06
        lnq2 = np.log(q2)
        lnb = 2.0 * np.log(Q_BOUNDARY)
        qfac = np.where(q2 <= Q_BOUNDARY ** 2,
                        1.0 + c * lnq2,
                        1.0 + c * lnb + 2.0 * c * (lnq2 - lnb))
        return (0.2 * x ** -0.1 - 0.1 * x ** -0.25) * (1.0 - x) ** 6 * qfac
    if pdg in (4, 5):
        m2 = (M_C if pdg == 4 else M_B) ** 2
        A = 0.4 if pdg == 4 else 0.25
        return A * x ** -0.1 * (1.0 - x) ** 7 * np.maximum(0.0, np.log(q2 / m2))
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
    assert list(flavors) == [-2, -1, 21, 1, 2, 3, 4, 5]
    # subgrids share the Q boundary knot
    assert subgrids[0][1][-1] == subgrids[1][1][0] == 10.0
    # forced knots at the flavor thresholds
    assert np.isclose(qs, M_C).any() and np.isclose(qs, M_B).any()


@pytest.mark.slow
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


def test_out_of_range_nearest_clamps(grid):
    v_lo = np.asarray(grid.xfxQ2(2, jnp.asarray([1e-8]), 100.0,
                                 extrapolation="nearest"))
    v_edge = np.asarray(grid.xfxQ2(2, jnp.asarray([1e-5]), 100.0,
                                   extrapolation="nearest"))
    np.testing.assert_allclose(v_lo, v_edge, rtol=1e-12)


def test_negative_small_x_region(grid):
    """Flavor 3 is negative below x ~ 1e-2 (NLO-gluon pathology): the
    value-space interpolation must track the sign change and the negative
    values off-knot."""
    rng = np.random.default_rng(1)
    x = np.exp(rng.uniform(np.log(2e-5), np.log(1e-3), 128))
    for q2 in (4.0, 2500.0):
        got = np.asarray(grid.xfxQ2(3, jnp.asarray(x), q2))
        want = xf_exact(3, x, q2)
        assert (got < 0).all()
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-4)
    # positive at large x: the interpolant crosses zero like the truth
    assert float(grid.xfxQ2(3, jnp.asarray([0.3]), 100.0)[0]) > 0


def test_subgrid_boundary_kink(grid):
    """Flavor 3's ln-Q2 slope doubles at the Q=10 subgrid boundary.  The
    reader must stay accurate right up to the boundary on BOTH sides (no
    cross-boundary stencil smoothing) while remaining continuous."""
    x = np.asarray([1e-4, 0.3])
    for q in (9.3, 9.9, 10.1, 10.9):
        got = np.asarray(grid.xfxQ2(3, jnp.asarray(x), q * q))
        np.testing.assert_allclose(got, xf_exact(3, x, q * q), rtol=1e-2)
    below = np.asarray(grid.xfxQ2(3, jnp.asarray(x), (10.0 - 1e-9) ** 2))
    above = np.asarray(grid.xfxQ2(3, jnp.asarray(x), (10.0 + 1e-9) ** 2))
    np.testing.assert_allclose(below, above, rtol=1e-6)
    # the kink is real: one-sided ln-Q2 slopes differ by ~2x
    q_lo, q_hi = 9.0, 11.0
    f0 = xf_exact(3, 1e-4, 100.0)
    s_lo = (f0 - np.asarray(grid.xfxQ2(3, jnp.asarray([1e-4]), q_lo ** 2))[0]) \
        / np.log(100.0 / q_lo ** 2)
    s_hi = (np.asarray(grid.xfxQ2(3, jnp.asarray([1e-4]), q_hi ** 2))[0] - f0) \
        / np.log(q_hi ** 2 / 100.0)
    assert abs(s_hi / s_lo - 2.0) < 0.2


def test_flavor_thresholds(grid):
    """Charm/bottom switch on at forced knots Q = m_c, m_b: ~0 below
    threshold, analytic ln(Q2/m2) growth above."""
    x = np.asarray([1e-3, 0.1])
    for pdg, m in ((4, M_C), (5, M_B)):
        scale = xf_exact(pdg, x, (4.0 * m) ** 2)
        # >= 2 cells below threshold: identically zero (local stencils)
        got_far = np.asarray(grid.xfxQ2(pdg, jnp.asarray(x), (0.6 * m) ** 2))
        np.testing.assert_allclose(got_far, 0.0, atol=1e-12)
        # just below: at most a tiny Hermite overshoot into the zero region
        got_below = np.asarray(grid.xfxQ2(pdg, jnp.asarray(x),
                                          (0.985 * m) ** 2))
        assert np.all(np.abs(got_below) < 0.05 * scale)
        # above: matches the kinked analytic growth
        for fq in (1.3, 2.0, 4.0):
            got = np.asarray(grid.xfxQ2(pdg, jnp.asarray(x), (fq * m) ** 2))
            np.testing.assert_allclose(got, xf_exact(pdg, x, (fq * m) ** 2),
                                       rtol=3e-2, atol=2e-3)


def test_continuation_extrapolation_policy(grid):
    """The default policy implements LHAPDF6's ContinuationExtrapolator
    recipe: anchor-pair log-linear (or linear for small/negative values)
    continuation below x_min, below q2_min, and above q2_max."""
    x_min, q2_min, q2_max = grid.x_min, grid.q2_min, grid.q2_max
    assert np.isclose(x_min, 1e-5) and np.isclose(q2_min, 1.0) \
        and np.isclose(q2_max, 1e6)

    def near(pdg, x, q2):
        return np.asarray(grid.xfxQ2(pdg, jnp.asarray(np.atleast_1d(x)),
                                     q2, extrapolation="nearest"))

    # below x_min at in-range q2: log-linear from (x_min, 1.01 x_min)
    q2 = 100.0
    x = 1e-7
    fa, fb = near(21, x_min, q2)[0], near(21, 1.01 * x_min, q2)[0]
    frac = (np.log(x) - np.log(x_min)) / np.log(1.01)
    want = np.exp(np.log(fa) + frac * (np.log(fb) - np.log(fa)))
    got = float(grid.xfxQ2(21, jnp.asarray([x]), q2)[0])
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # ... which reproduces the pure power law x^-0.2 to ~%
    np.testing.assert_allclose(got, xf_exact(21, x, q2), rtol=2e-2)

    # above q2_max: log-linear from (0.99 q2_max, q2_max)
    q2 = 3e6
    x = np.asarray([1e-3])
    ga, gb = near(2, x, 0.99 * q2_max)[0], near(2, x, q2_max)[0]
    frac = (np.log(q2) - np.log(0.99 * q2_max)) / -np.log(0.99)
    want = np.exp(np.log(ga) + frac * (np.log(gb) - np.log(ga)))
    got = float(grid.xfxQ2(2, jnp.asarray(x), q2)[0])
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # below q2_min: anchors (q2_min, 1.01 q2_min), extrapolating down
    q2 = 0.5
    ga, gb = near(2, x, q2_min)[0], near(2, x, 1.01 * q2_min)[0]
    frac = (np.log(q2) - np.log(q2_min)) / np.log(1.01)
    want = np.exp(np.log(ga) + frac * (np.log(gb) - np.log(ga)))
    got = float(grid.xfxQ2(2, jnp.asarray(x), q2)[0])
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # negative values fall back to the linear branch (no log of negatives)
    got_neg = float(grid.xfxQ2(3, jnp.asarray([1e-7]), 100.0)[0])
    assert np.isfinite(got_neg) and got_neg < 0

    # corner (x and q2 both out of range) stays finite and close to the
    # analytic continuation
    got_c = float(grid.xfxQ2(21, jnp.asarray([1e-7]), 3e6)[0])
    assert np.isfinite(got_c)
    np.testing.assert_allclose(got_c, xf_exact(21, 1e-7, 3e6), rtol=0.3)

    # jittable
    import jax
    f = jax.jit(lambda xx: grid.xfxQ2(21, xx, 100.0))
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray([1e-7, 1e-3]))),
        np.asarray(grid.xfxQ2(21, jnp.asarray([1e-7, 1e-3]), 100.0)),
        rtol=1e-12)


@pytest.mark.slow
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


@pytest.mark.slow
def test_realistic_knot_density_accuracy(tmp_path):
    """Off-knot accuracy at REAL (NNPDF3.1-like) knot density (VERDICT r3
    missing #1): smooth flavors must interpolate to < 1e-3 relative error
    at geometric cell midpoints (the cubic's worst case), interior cells.
    Full convergence table: tools/pdf_convergence.py -> docs/PDF_ACCURACY.md.
    """
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    import make_pdf_fixture as fx

    xs, q_subgrids = fx.nnpdf_like_knots(1.0)
    path = tmp_path / "nnpdf_like_0000.dat"
    path.write_text(fx.fixture_text(xs, q_subgrids))
    grid = LHAPDFGrid.from_dat(str(path))

    margin = 2
    for qs in q_subgrids:
        qs = np.asarray(qs)
        xm = np.sqrt(xs[margin:-margin - 1] * xs[margin + 1:-margin])
        qm = np.sqrt(qs[margin:-margin - 1] * qs[margin + 1:-margin])
        X, Q = np.meshgrid(xm, qm, indexing="ij")
        q2 = (Q * Q).ravel()
        for pdg in (-2, -1, 21, 1, 2):
            exact = fx.xf(pdg, X.ravel(), q2)
            got = np.asarray(grid.xfxQ2(pdg, X.ravel(), q2))
            denom = np.maximum(np.abs(exact), 1e-3 * np.max(np.abs(exact)))
            rel = np.abs(got - exact) / denom
            assert rel.max() < 1e-3, (pdg, rel.max())
            assert np.median(rel) < 1e-5
