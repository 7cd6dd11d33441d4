"""Real-LHAPDF-data validation — runs whenever a real grid is present.

This environment has no network egress, no `lhapdf` wheel, and no grid
files anywhere in the image (full-filesystem search, r5), so real LHAPDF
bytes cannot be vendored from inside it.  This test keeps the validation
armed instead of pending: drop any real set into a standard LHAPDF path
(or point ``NF_TPU_LHAPDF_SET`` at a member .dat / set directory) and the
suite pins the reader against it with no further work — knot-exactness,
optional cross-check vs the C++ bindings, and the end-to-end PDF
convolution (tools/validate_real_lhapdf.py holds the logic).

Until then the reader's correctness rests on the adversarial fixture
suite (tests/test_lhapdf_reader.py: NNPDF-density knots, negative small-x
flavor, subgrid-boundary kink, flavor thresholds, continuation
extrapolation) — format- and semantics-complete, but not real bytes.
"""

import pytest

from tools.validate_real_lhapdf import find_member, validate


@pytest.mark.slow
def test_reader_against_real_lhapdf_member():
    path = find_member()
    if path is None:
        pytest.skip("no real LHAPDF member in the image "
                    "(set NF_TPU_LHAPDF_SET to enable)")
    out = validate(path, n_off=2000)
    assert out["knot_exact"], out
    assert out["e2e_finite"], out
    assert out["e2e_positive_fraction"] > 0.5, out
    if isinstance(out["vs_lhapdf_cxx"], dict):
        for pdg, e in out["vs_lhapdf_cxx"].items():
            assert e["p99"] < 5e-3, (pdg, e)
