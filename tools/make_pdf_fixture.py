"""Generate a small LHAPDF6-format (lhagrid1) member file fixture.

The environment has no lhapdf wheel and no network, so the test fixture is
synthesized from a smooth analytic x*f(x, Q2) sampled at the knots of a
two-subgrid layout (the standard LHAPDF6 structure: subgrids partition the
Q range and share boundary knots).  Tests parse the file with
nf_tpu.phasespace.lhapdf_reader and check the interpolated values against
the analytic form off-knot.

Run: python tools/make_pdf_fixture.py  (rewrites tests/data/toypdf_0000.dat)
"""

import os

import numpy as np

FLAVORS = [-2, -1, 21, 1, 2]

# pdg -> (A, a, b, c): x*f = A * x^a * (1-x)^b * (1 + c*ln Q2)
PARAMS = {
    21: (3.0, -0.2, 5.0, 0.08),
    1: (0.7, 0.5, 4.0, 0.05),
    2: (1.4, 0.5, 3.0, 0.05),
    -1: (0.2, -0.1, 6.0, 0.06),
    -2: (0.15, -0.1, 6.0, 0.06),
}


def xf(pdg, x, q2):
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


def main():
    # log-spaced at small x, dense near 1 (real LHAPDF grids do the same:
    # x*f falls like (1-x)^b there, too steep for wide log-x cells)
    xs = np.concatenate([np.geomspace(1e-5, 0.5, 72),
                         1.0 - np.geomspace(0.5, 0.002, 41)[1:]])
    qs1 = np.geomspace(1.0, 10.0, 16)
    qs2 = np.geomspace(10.0, 1000.0, 24)
    lines = ["PdfType: central", "Format: lhagrid1", "---"]
    lines += subgrid_block(xs, qs1)
    lines += subgrid_block(xs, qs2)
    out = os.path.join(os.path.dirname(__file__), os.pardir,
                       "tests", "data", "toypdf_0000.dat")
    out = os.path.abspath(out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
