"""LHE event-file writer/reader tests (nf_tpu/utils/lhe.py)."""

import numpy as np
import jax

from nf_tpu.phasespace import FlatInvertiblePhasespace
from nf_tpu.utils.lhe import lhe_string, read_lhe, write_lhe


def _events(n=64, e_cm=500.0, seed=0):
    """COM-frame q qbar -> 4 massless leptons via the flat generator
    (momenta rows 0/1 are the incoming partons, as the pipeline emits)."""
    gen = FlatInvertiblePhasespace([0.0, 0.0], [0.0] * 4)
    rv = jax.random.uniform(jax.random.PRNGKey(seed),
                            (n, gen.nDimPhaseSpace()))
    mom, wgt = gen.generateKinematics_batch(e_cm, rv)
    return np.asarray(mom), np.asarray(wgt)


def test_lhe_roundtrip_unweighted(tmp_path):
    mom, _ = _events()
    n, e_col = mom.shape[0], 6500.0
    # xb consistent with the COM energy: sqrt(xb1*xb2)*2*E_beam = e_cm
    rng = np.random.default_rng(1)
    r = rng.uniform(0.5, 2.0, n)
    base = 500.0 / (2 * e_col)
    xb = np.stack([base * r, base / r], axis=1)

    pdgs = [1, -1, 11, -11, 13, -13]
    path = tmp_path / "events.lhe"
    write_lhe(path, mom, pdgs, xb=xb, E_beam=e_col, sigma_pb=3.2,
              sigma_err_pb=0.05)
    out = read_lhe(path)

    assert out["init"]["idwtup"] == 3
    assert out["init"]["sigma_pb"] == 3.2
    assert out["init"]["beam_pdgs"] == (2212, 2212)
    np.testing.assert_array_equal(out["pdgs"], pdgs)
    np.testing.assert_array_equal(out["status"], [-1, -1, 1, 1, 1, 1])
    # q qbar initial state: one color line
    np.testing.assert_array_equal(out["colors"][:2], [[501, 0], [0, 501]])
    np.testing.assert_array_equal(out["weights"], np.ones(n))

    p = out["momenta"]
    # momentum conservation in the lab frame
    np.testing.assert_allclose(p[:, :2].sum(1), p[:, 2:].sum(1),
                               rtol=1e-6, atol=1e-6 * 500)
    # incoming partons along +/- z at xb_i * E_beam
    np.testing.assert_allclose(p[:, 0, 0], xb[:, 0] * e_col, rtol=1e-6)
    np.testing.assert_allclose(p[:, 0, 3], xb[:, 0] * e_col, rtol=1e-6)
    np.testing.assert_allclose(p[:, 1, 0], xb[:, 1] * e_col, rtol=1e-6)
    np.testing.assert_allclose(p[:, 1, 3], -xb[:, 1] * e_col, rtol=1e-6)
    np.testing.assert_allclose(np.abs(p[:, :2, 1:3]), 0, atol=1e-6 * 500)
    # massless rows, scale = sqrt(s_hat) = e_cm
    np.testing.assert_allclose(out["masses"], 0, atol=1e-4)
    np.testing.assert_allclose(out["scales"], 500.0, rtol=1e-6)
    # invariant mass of the outgoing system equals e_cm in the lab too
    tot = p[:, 2:].sum(1)
    m_inv = np.sqrt(tot[:, 0] ** 2 - (tot[:, 1:] ** 2).sum(1))
    np.testing.assert_allclose(m_inv, 500.0, rtol=1e-6)


def test_lhe_weighted_partial_mode(tmp_path):
    mom, _ = _events(n=32)
    wts = 1.0 + np.random.default_rng(2).exponential(0.3, 32)
    path = tmp_path / "weighted.lhe"
    write_lhe(path, mom, [1, -1, 11, -11, 13, -13], weights=wts,
              sigma_pb=2.0, unit_weight_pb=2.0 / 32)
    out = read_lhe(path)
    assert out["init"]["idwtup"] == 4
    np.testing.assert_allclose(out["weights"], wts * 2.0 / 32, rtol=1e-9)
    # no xb: every row outgoing, written as-is (COM)
    np.testing.assert_array_equal(out["status"], [1] * 6)
    np.testing.assert_allclose(out["momenta"], mom, rtol=1e-9,
                               atol=1e-9 * 500)
    assert np.all(out["scales"] == -1.0)


def test_lhe_string_is_valid_xml_and_precise():
    mom, _ = _events(n=8)
    s = lhe_string(mom, [1, -1, 11, -11, 13, -13])
    assert s.startswith('<LesHouchesEvents version="3.0">')
    import io
    out = read_lhe(io.StringIO(s))  # ET.parse validates the XML
    np.testing.assert_allclose(out["momenta"], mom, rtol=1e-9,
                               atol=1e-9 * 500)
