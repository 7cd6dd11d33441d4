"""Tree-topology decay channels + multi-channel combination + chain maps.

Pins (VERDICT r3 next-steps #1):
  * the tree channel's closed-form weight against the analytic massless
    phase-space volume (reference get_flatWeights,
    flat_phase_space_generator.py:81-97) and against the flat RAMBO
    generator on massive finals;
  * the double-Breit-Wigner integral against an independent scipy.dblquad
    reduction;
  * exact unbiasedness of the alpha-mixture multi-channel estimator and
    of the chain-variable BW map (mappings.chain_mass_map), both with and
    without PDF convolution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.generator import FlatInvertiblePhasespace
from nf_tpu.phasespace.mappings import chain_mass_map
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.phasespace.topology import (
    BreitWignerSMap,
    PhaseSpaceGeneratorError,
    PowerSMap,
    ResonanceDecayPhasespace,
    UniformSMap,
    multichannel_integrand,
    optimize_alphas,
)

E = 400.0
MZ, GZ = 91.188, 2.4952
MZ2, GAM2 = MZ ** 2, MZ ** 2 * GZ ** 2


def double_bw(m):
    fin = m[:, 2:, :]
    s01 = lorentz.square(fin[:, 0] + fin[:, 1])
    s23 = lorentz.square(fin[:, 2] + fin[:, 3])
    return 1e4 / ((s01 - MZ2) ** 2 + GAM2) * 1e4 / ((s23 - MZ2) ** 2 + GAM2)


def analytic_double_bw(E_cm):
    """Independent reduction: dPhi_4 with BW(s_A) BW(s_B) collapses to a
    2-D integral over the two pair masses (angles integrate to 1/(8 pi)
    each for massless pairs)."""
    from scipy import integrate as sint

    def rho(M, N, m):
        return np.sqrt(max((M * M - (N + m) ** 2) * (M * M - (N - m) ** 2),
                           0.0)) / (8 * M * M)

    def inner(sB, sA):
        return (1e4 / ((sA - MZ2) ** 2 + GAM2)) \
            * (1e4 / ((sB - MZ2) ** 2 + GAM2)) \
            * rho(E_cm, np.sqrt(sA), np.sqrt(sB)) / np.pi \
            * (1 / (8 * np.pi)) ** 2 / (2 * np.pi) ** 2

    val, err = sint.dblquad(inner, 0, E_cm ** 2,
                            0, lambda sA: (E_cm - np.sqrt(sA)) ** 2,
                            epsabs=1e-14, epsrel=1e-9)
    assert err < 1e-8 * abs(val)
    return val


@pytest.mark.parametrize("topo", [((0, 1), (2, 3)), (0, (1, (2, 3))),
                                  ((0, 2), (1, 3))])
def test_flat_volume_parity(topo):
    """Uniform s-maps integrate to the closed-form massless volume."""
    gen = ResonanceDecayPhasespace([0.0, 0.0], [0.0] * 4, topo)
    w = jax.random.uniform(jax.random.PRNGKey(42),
                           (400_000, gen.nDimPhaseSpace()))
    _, wt = jax.jit(lambda w: gen.generateKinematics_batch(E, w))(w)
    vol = np.asarray(wt) * 2 * E ** 2        # undo the 1/(2 s_hat) flux
    exact = FlatInvertiblePhasespace.get_flatWeights(E, 4)
    err = vol.std(ddof=1) / np.sqrt(len(vol))
    assert abs(vol.mean() - exact) < 5 * err
    assert err / exact < 0.01


def test_momentum_conservation_and_onshell():
    masses = [50.0, 30.0, 80.0, 10.0]
    gen = ResonanceDecayPhasespace([0.0, 0.0], masses, ((0, 1), (2, 3)))
    w = jax.random.uniform(jax.random.PRNGKey(0),
                           (20_000, gen.nDimPhaseSpace()))
    mom, wt = gen.generateKinematics_batch(1000.0, w)
    tot = jnp.sum(mom[:, 2:, :], axis=1) - jnp.sum(mom[:, :2, :], axis=1)
    np.testing.assert_allclose(np.asarray(tot), 0.0, atol=1e-6)
    for i, m in enumerate(masses):
        sq = np.asarray(lorentz.square(mom[:, 2 + i, :]))
        np.testing.assert_allclose(sq, m ** 2, rtol=1e-6)
    assert np.all(np.asarray(wt) >= 0)


@pytest.mark.slow
def test_massive_volume_vs_flat_generator():
    """Same dPhi measure as the flat RAMBO generator on massive finals."""
    masses = [50.0, 50.0, 100.0, 80.0]
    E_cm = 1000.0
    topo = ResonanceDecayPhasespace([0.0, 0.0], masses, ((0, 1), (2, 3)))
    flat = FlatInvertiblePhasespace([0.0, 0.0], masses)
    n = topo.nDimPhaseSpace()
    w = jax.random.uniform(jax.random.PRNGKey(3), (400_000, n))
    v_t = np.asarray(topo.generateKinematics_batch(E_cm, w)[1])
    v_f = np.asarray(flat.generateKinematics_batch(E_cm, w)[1])
    m_t, e_t = v_t.mean(), v_t.std(ddof=1) / np.sqrt(len(v_t))
    m_f, e_f = v_f.mean(), v_f.std(ddof=1) / np.sqrt(len(v_f))
    assert abs(m_t - m_f) < 5 * np.hypot(e_t, e_f)


def test_channel_weight_ps_consistency():
    """channel_weight_ps at the generator's own momenta reproduces the
    generation-time PS weight (closed-form round trip)."""
    bw = {(0, 1): BreitWignerSMap(MZ, GZ), (2, 3): BreitWignerSMap(MZ, GZ)}
    gen = ResonanceDecayPhasespace([0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
                                   mass_maps=bw)
    w = jax.random.uniform(jax.random.PRNGKey(1),
                           (20_000, gen.nDimPhaseSpace()))
    mom, wt = gen.generateKinematics_batch(E, w)
    ps_gen = np.asarray(wt) * 2 * E ** 2
    ps_at = np.asarray(gen.channel_weight_ps(mom))
    np.testing.assert_allclose(ps_at, ps_gen, rtol=1e-8)


def test_analytic_double_bw_pin():
    """BW-mapped channel: near-unit ESS and agreement with the independent
    scipy.dblquad value at high precision."""
    bw = {(0, 1): BreitWignerSMap(MZ, GZ), (2, 3): BreitWignerSMap(MZ, GZ)}
    gen = ResonanceDecayPhasespace([0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
                                   mass_maps=bw)

    def f(w):
        mom, wt = gen.generateKinematics_batch(E, w)
        return double_bw(mom) * wt

    w = jax.random.uniform(jax.random.PRNGKey(2),
                           (500_000, gen.nDimPhaseSpace()))
    vals = np.asarray(jax.jit(f)(w)) * 2 * E ** 2
    ess = vals.mean() ** 2 / (vals ** 2).mean()
    assert ess > 0.9          # the maps flatten both resonances
    I_an = analytic_double_bw(E)
    err = vals.std(ddof=1) / np.sqrt(len(vals))
    assert abs(vals.mean() - I_an) < 5 * err
    assert err / I_an < 1e-4  # and the comparison is sharp


def test_multichannel_unbiased():
    """alpha-mixture over the two lepton pairings stays exactly unbiased
    (the ME is resonant only in the first pairing)."""
    ch1 = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)})
    ch2 = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 2), (1, 3)),
        mass_maps={(0, 2): BreitWignerSMap(MZ, GZ),
                   (1, 3): BreitWignerSMap(MZ, GZ)})
    g = multichannel_integrand(double_bw, [ch1, ch2], [0.7, 0.3], E)
    w = jax.random.uniform(jax.random.PRNGKey(5),
                           (500_000, 1 + ch1.nDimPhaseSpace()))
    vals = np.asarray(jax.jit(g)(w)) * 2 * E ** 2
    I_an = analytic_double_bw(E)
    err = vals.std(ddof=1) / np.sqrt(len(vals))
    assert abs(vals.mean() - I_an) < 5 * err
    # the mixture keeps a healthy ESS (channel 1 dominates usefully)
    assert vals.mean() ** 2 / (vals ** 2).mean() > 0.3


def test_multichannel_beats_single_on_competing_pairings():
    """Resonances in COMPETING lepton pairings: neither single decay-tree
    channel can flatten both matrix-element terms, while the alpha-mixture
    flattens each term where its channel dominates — the capability the
    multi-channel machinery exists for (examples/zz_multichannel.py is the
    user-facing version).  Also pins the Kleiss-Pittau iteration: on a
    pairing-symmetric ME the optimized weights stay balanced and the
    mixture variance does not grow."""
    def me(m):
        fin = m[:, 2:, :]
        def bw(s):
            return 1e4 / ((s - MZ2) ** 2 + GAM2)
        s01 = lorentz.square(fin[:, 0] + fin[:, 1])
        s23 = lorentz.square(fin[:, 2] + fin[:, 3])
        s03 = lorentz.square(fin[:, 0] + fin[:, 3])
        s12 = lorentz.square(fin[:, 1] + fin[:, 2])
        return bw(s01) * bw(s23) + bw(s03) * bw(s12)

    ch1 = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)})
    ch2 = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 3), (1, 2)),
        mass_maps={(0, 3): BreitWignerSMap(MZ, GZ),
                   (1, 2): BreitWignerSMap(MZ, GZ)})
    n_lat = 1 + ch1.nDimPhaseSpace()

    def ess(channels, alphas, seed):
        g = multichannel_integrand(me, channels, alphas, E)
        w = jax.random.uniform(jax.random.PRNGKey(seed), (200_000, n_lat))
        v = np.asarray(jax.jit(g)(w))
        return v.mean() ** 2 / (v ** 2).mean()

    e1 = ess([ch1], [1.0], 7)
    e2 = ess([ch2], [1.0], 7)
    e12 = ess([ch1, ch2], [0.5, 0.5], 7)
    assert e12 > 3 * max(e1, e2), (e1, e2, e12)

    al, hist = optimize_alphas(me, [ch1, ch2], [0.5, 0.5], E,
                               jax.random.PRNGKey(1), n_iter=3,
                               n_samples=1 << 15)
    assert 0.3 < al[0] < 0.7  # symmetric ME -> balanced weights
    assert hist[-1]["variance"] <= hist[0]["variance"] * 1.5


def test_chain_mass_map_unbiased():
    """BW through the flat chain's bisection: unbiased, large ESS gain."""
    gen = FlatInvertiblePhasespace([0.0, 0.0], [0.0] * 4)

    def me(m):
        fin = m[:, 2:, :]
        s23 = lorentz.square(fin[:, 2] + fin[:, 3])
        return 1e4 / ((s23 - MZ2) ** 2 + GAM2)

    def integrand(w):
        mom, wt = gen.generateKinematics_batch(E, w)
        return me(mom) * wt

    g = chain_mass_map(gen, E, BreitWignerSMap(MZ, GZ))(integrand)
    w = jax.random.uniform(jax.random.PRNGKey(1),
                           (400_000, gen.nDimPhaseSpace()))
    v0 = np.asarray(jax.jit(integrand)(w))
    v1 = np.asarray(jax.jit(g)(w))
    e0 = v0.std(ddof=1) / np.sqrt(len(v0))
    e1 = v1.std(ddof=1) / np.sqrt(len(v1))
    assert abs(v1.mean() - v0.mean()) < 5 * np.hypot(e0, e1)
    ess0 = v0.mean() ** 2 / (v0 ** 2).mean()
    ess1 = v1.mean() ** 2 / (v1 ** 2).mean()
    assert ess1 > 5 * ess0
    assert ess1 > 0.5


def test_chain_mass_map_pdf_mode():
    """The conditional map tracks the per-event partonic E_cm through the
    tau-mode PDF convolution."""
    gen = FlatInvertiblePhasespace([0.0, 0.0], [0.0] * 4, pdf=ToyPDF(),
                                   pdf_active=True, tau=True)
    E_col = 2000.0

    def me(m):
        fin = m[:, 2:, :]
        s23 = lorentz.square(fin[:, 2] + fin[:, 3])
        return 1e4 / ((s23 - MZ2) ** 2 + GAM2)

    def integrand(w):
        mom, wt = gen.generateKinematics_batch(E_col, w, pdgs=(2, -2))
        return me(mom) * wt

    g = chain_mass_map(gen, E_col, BreitWignerSMap(MZ, GZ))(integrand)
    n = gen.nDimPhaseSpace() + 2
    w = jax.random.uniform(jax.random.PRNGKey(9), (400_000, n))
    v0 = np.asarray(jax.jit(integrand)(w))
    v1 = np.asarray(jax.jit(g)(w))
    e0 = v0.std(ddof=1) / np.sqrt(len(v0))
    e1 = v1.std(ddof=1) / np.sqrt(len(v1))
    assert abs(v1.mean() - v0.mean()) < 5 * np.hypot(e0, e1)
    assert e1 < e0  # the map reduces the error at fixed N


def test_power_map_roundtrip():
    m = PowerSMap(-1.5, s_floor=1.0)
    u = jnp.linspace(0.01, 0.99, 101)
    s, ds_du = m.sample(u, jnp.asarray(0.0), jnp.asarray(1e4))
    np.testing.assert_allclose(
        np.asarray(m.ds_du_at(s, jnp.asarray(0.0), jnp.asarray(1e4))),
        np.asarray(ds_du), rtol=1e-10)
    # numeric derivative check
    eps = 1e-6
    s2, _ = m.sample(u + eps, jnp.asarray(0.0), jnp.asarray(1e4))
    np.testing.assert_allclose(np.asarray((s2 - s) / eps),
                               np.asarray(ds_du), rtol=1e-3)


@pytest.mark.slow
def test_identity_init_is_identity():
    """create_model(identity_init=True): the fresh flow is the exact
    identity with J = 1, so composing with a channel map starts at the
    map's own ESS (factory.identity_init)."""
    from nf_tpu import PWQuadManager

    NF = PWQuadManager(n_flow=10, seed=3)
    NF.create_model(4, 32, [32] * 2, identity_init=True)
    NF.best_params = (NF._params, NF._bn_state)
    w = jax.random.uniform(jax.random.PRNGKey(0), (256, 10))
    from nf_tpu.flows import model as fmodel
    x, jac, _ = fmodel.forward(NF._flow, NF._params, NF._bn_state, w, False)
    np.testing.assert_allclose(np.asarray(x), np.asarray(w), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jac), 1.0, atol=1e-12)
    # pwlin variant too
    from nf_tpu import PWLinManager
    NFL = PWLinManager(n_flow=4, seed=3)
    NFL.create_model(2, 4, 8, [8] * 2, roll_step=1, identity_init=True)
    w = jax.random.uniform(jax.random.PRNGKey(1), (256, 4))
    x, jac, _ = fmodel.forward(NFL._flow, NFL._params, NFL._bn_state, w,
                               False)
    np.testing.assert_allclose(np.asarray(x), np.asarray(w), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jac), 1.0, atol=1e-12)


def test_shifted_power_map_unbiased():
    """The tau-threshold importance map is a measure-preserving bijection:
    remapping any latent dim leaves the integral unchanged."""
    from functools import partial

    from nf_tpu.phasespace.mappings import (remap_integrand,
                                            shifted_power_unit_map)

    def f(w):
        return jnp.exp(-10.0 * w[:, 0]) * (1.0 + w[:, 1])

    g = remap_integrand(f, 0, partial(shifted_power_unit_map,
                                      exponent=-2.0, shift=0.05))
    w = jax.random.uniform(jax.random.PRNGKey(0), (400_000, 2))
    v0 = np.asarray(f(w))
    v1 = np.asarray(g(w))
    e = np.hypot(v0.std(ddof=1), v1.std(ddof=1)) / np.sqrt(len(w))
    assert abs(v1.mean() - v0.mean()) < 5 * e
    # and it concentrates where the integrand lives: variance shrinks
    assert v1.std(ddof=1) < 0.5 * v0.std(ddof=1)


def test_topology_validation():
    with pytest.raises(PhaseSpaceGeneratorError):
        ResonanceDecayPhasespace([0.0, 0.0], [0.0] * 4, ((0, 1), (2, 2)))
    with pytest.raises(PhaseSpaceGeneratorError):
        ResonanceDecayPhasespace([0.0, 0.0], [0.0] * 4, ((0, 1), 2))
    with pytest.raises(PhaseSpaceGeneratorError):
        ResonanceDecayPhasespace(
            [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
            mass_maps={(1, 2): UniformSMap()})
    with pytest.raises(ValueError):
        chain_mass_map(FlatInvertiblePhasespace([0.0, 0.0], [0.0] * 2),
                       E, BreitWignerSMap(MZ, GZ))


def test_optimize_alphas_kleiss_pittau():
    """The Kleiss-Pittau iteration shifts weight toward the channel the
    ME is actually resonant in, lowers the sampled variance, and stays
    unbiased at every iterate."""
    from nf_tpu.phasespace import optimize_alphas

    ch1 = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)})
    ch2 = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 2), (1, 3)),
        mass_maps={(0, 2): BreitWignerSMap(MZ, GZ),
                   (1, 3): BreitWignerSMap(MZ, GZ)})
    # start heavily MIS-weighted toward the wrong pairing
    alphas, hist = optimize_alphas(
        double_bw, [ch1, ch2], [0.15, 0.85], E,
        jax.random.PRNGKey(3), n_iter=4, n_samples=1 << 15)
    # double_bw is resonant in the (01)(23) pairing -> channel 1 wins
    assert alphas[0] > 0.6
    assert hist[-1]["variance"] < 0.5 * hist[0]["variance"]
    # every iterate's integral estimate is unbiased
    I_an = analytic_double_bw(E) / (2 * E ** 2)
    for h in hist:
        err = np.sqrt(h["variance"] / (1 << 15))
        assert abs(h["integral"] - I_an) < 6 * err


# ---------------------------------------------------------------------------
# Inversion (latents from kinematics) — the enabler for learned multi-channel
# ---------------------------------------------------------------------------

def test_smap_invert_roundtrip():
    """u -> s -> u closed-form inverses for all three s-maps."""
    u = jnp.linspace(0.001, 0.999, 101)
    lo, hi = jnp.asarray(100.0), jnp.asarray(9e4)
    for m in (UniformSMap(), BreitWignerSMap(MZ, GZ),
              PowerSMap(-1.5, s_floor=1.0)):
        s, _ = m.sample(u, lo, hi)
        np.testing.assert_allclose(np.asarray(m.invert(s, lo, hi)),
                                   np.asarray(u), atol=1e-9,
                                   err_msg=type(m).__name__)


@pytest.mark.parametrize("topo,maps", [
    (((0, 1), (2, 3)), {(0, 1): BreitWignerSMap(MZ, GZ),
                        (2, 3): BreitWignerSMap(MZ, GZ)}),
    ((0, (1, (2, 3))), {(2, 3): PowerSMap(-1.5, s_floor=1.0)}),
    (((0, 2), (1, 3)), None),
])
def test_tree_invert_roundtrip(topo, maps):
    """rv -> momenta -> rv through the tree channel, massive finals."""
    masses = [5.0, 3.0, 8.0, 1.0]
    gen = ResonanceDecayPhasespace([0.0, 0.0], masses, topo, mass_maps=maps)
    w = jax.random.uniform(jax.random.PRNGKey(7),
                           (5_000, gen.nDimPhaseSpace()), jnp.float64)
    w = 0.002 + 0.996 * w      # stay off exact endpoints (clip in inverse)
    mom, wt = gen.generateKinematics_batch(800.0, w)
    rv = np.asarray(gen.invertKinematics_batch(800.0, mom))
    np.testing.assert_allclose(rv, np.asarray(w), atol=5e-7)
    # and forward again: identical momenta
    mom2, wt2 = gen.generateKinematics_batch(800.0, jnp.asarray(rv))
    np.testing.assert_allclose(np.asarray(mom2), np.asarray(mom), atol=1e-5)


def test_tree_invert_roundtrip_pdf():
    """Roundtrip incl. the PDF convolution columns (tau mode)."""
    gen = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)},
        pdf=ToyPDF(), pdf_active=True, tau=True)
    n = gen.nDimPhaseSpace() + 2
    w = jax.random.uniform(jax.random.PRNGKey(8), (5_000, n), jnp.float64)
    w = 0.002 + 0.996 * w
    E_col = 2000.0
    mom, wt = gen.generateKinematics_batch(E_col, w, pdgs=(2, -2))
    _, _, xb1, xb2, _ = gen._convolve_pdf(E_col, w, (2, -2))
    rv = np.asarray(gen.invertKinematics_batch(E_col, mom, xb1, xb2))
    np.testing.assert_allclose(rv, np.asarray(w), atol=5e-7)


def test_cross_channel_invert_consistency():
    """A point generated by channel A, pushed through channel B's inverse
    and back through B's forward map, reproduces the same momenta — the
    property the learned multi-channel density evaluation relies on."""
    ch_a = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)})
    ch_b = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 3), (1, 2)),
        mass_maps={(0, 3): PowerSMap(-1.2, s_floor=1.0)})
    w = jax.random.uniform(jax.random.PRNGKey(9),
                           (5_000, ch_a.nDimPhaseSpace()), jnp.float64)
    w = 0.002 + 0.996 * w
    mom, _ = ch_a.generateKinematics_batch(E, w)
    u_b = ch_b.invertKinematics_batch(E, mom)
    assert np.all(np.asarray(u_b) >= 0) and np.all(np.asarray(u_b) <= 1)
    mom2, _ = ch_b.generateKinematics_batch(E, u_b)
    # only points inside B's support roundtrip (the PowerSMap s_floor
    # truncates it; channel_weight_ps is exactly 0 outside, which is what
    # the multi-channel denominator consumes)
    in_support = np.asarray(ch_b.channel_weight_ps(mom)) > 0
    assert in_support.mean() > 0.95
    np.testing.assert_allclose(np.asarray(mom2)[in_support],
                               np.asarray(mom)[in_support], atol=1e-5)
    assert not np.any(in_support
                      & (np.abs(np.asarray(mom2) - np.asarray(mom))
                         .max(axis=(1, 2)) > 1e-5))


# ---------------------------------------------------------------------------
# 2 -> 6 cascade (three-level tree): the generality the 4-body groups
# above don't reach — nested resonances at two depths (t -> W b like).
# ---------------------------------------------------------------------------

MT, GT = 173.0, 1.4
MW, GW = 80.4, 2.1
E6 = 1000.0
TOPO6 = ((0, (1, 2)), (3, (4, 5)))
MAPS6 = {(0, 1, 2): BreitWignerSMap(MT, GT),
         (1, 2): BreitWignerSMap(MW, GW),
         (3, 4, 5): BreitWignerSMap(MT, GT),
         (4, 5): BreitWignerSMap(MW, GW)}


def test_cascade6_flat_volume_parity():
    """Uniform s-maps on the 3-level 6-leaf tree integrate to the
    closed-form massless 6-body volume (get_flatWeights, reference
    flat_phase_space_generator.py:81-97)."""
    gen = ResonanceDecayPhasespace([0.0, 0.0], [0.0] * 6, TOPO6)
    assert gen.nDimPhaseSpace() == 3 * 6 - 4
    w = jax.random.uniform(jax.random.PRNGKey(6),
                           (1_000_000, gen.nDimPhaseSpace()))
    _, wt = jax.jit(lambda w: gen.generateKinematics_batch(E6, w))(w)
    vol = np.asarray(wt) * 2 * E6 ** 2
    exact = FlatInvertiblePhasespace.get_flatWeights(E6, 6)
    err = vol.std(ddof=1) / np.sqrt(len(vol))
    assert abs(vol.mean() - exact) < 5 * err
    assert err / exact < 0.05


def test_cascade6_bw_channel():
    """Nested BW maps (t above W): conservation, on-shell finals,
    closed-form density round trip, and full latent inversion."""
    gen = ResonanceDecayPhasespace([0.0, 0.0], [0.0] * 6, TOPO6,
                                   mass_maps=MAPS6)
    w = jax.random.uniform(jax.random.PRNGKey(16),
                           (20_000, gen.nDimPhaseSpace()), jnp.float64)
    w = 0.002 + 0.996 * w
    mom, wt = gen.generateKinematics_batch(E6, w)
    tot = jnp.sum(mom[:, 2:, :], axis=1) - jnp.sum(mom[:, :2, :], axis=1)
    np.testing.assert_allclose(np.asarray(tot), 0.0, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(lorentz.square(mom[:, 2:, :].reshape(-1, 4))), 0.0,
        atol=1e-6)
    # the sampled pair masses sit on the mapped resonances
    m_top = np.sqrt(np.asarray(lorentz.square(
        mom[:, 2 + 0] + mom[:, 2 + 1] + mom[:, 2 + 2])))
    m_w = np.sqrt(np.asarray(lorentz.square(mom[:, 2 + 1] + mom[:, 2 + 2])))
    assert abs(np.median(m_top) - MT) < 5 * GT
    assert abs(np.median(m_w) - MW) < 5 * GW
    # closed-form channel density reproduces the generation-time weight
    ps_gen = np.asarray(wt) * 2 * E6 ** 2
    ps_at = np.asarray(gen.channel_weight_ps(mom))
    np.testing.assert_allclose(ps_at, ps_gen, rtol=1e-8)
    # full inversion round trip at depth 3
    rv = np.asarray(gen.invertKinematics_batch(E6, mom))
    np.testing.assert_allclose(rv, np.asarray(w), atol=5e-7)


def test_cascade6_ess_vs_flat():
    """On a t-tbar-like toy |M|^2 the cascade channel's uniform-latent ESS
    beats the flat RAMBO chain by orders of magnitude — the 6-body
    version of the multi-channel capability story."""
    def me6(m):
        f = m[:, 2:, :]
        out = 1.0
        for trip, pair in (((0, 1, 2), (1, 2)), ((3, 4, 5), (4, 5))):
            s_t = lorentz.square(f[:, trip[0]] + f[:, trip[1]]
                                 + f[:, trip[2]])
            s_w = lorentz.square(f[:, pair[0]] + f[:, pair[1]])
            out = out * 1e6 / ((s_t - MT ** 2) ** 2 + (MT * GT) ** 2) \
                * 1e6 / ((s_w - MW ** 2) ** 2 + (MW * GW) ** 2)
        return out

    def ess(gen2):
        w = jax.random.uniform(jax.random.PRNGKey(10),
                               (1 << 18, gen2.nDimPhaseSpace()))
        mom, wt = gen2.generateKinematics_batch(E6, w)
        v = np.asarray(me6(mom) * wt)
        return v.mean() ** 2 / np.maximum((v ** 2).mean(), 1e-300)

    e_casc = ess(ResonanceDecayPhasespace([0.0, 0.0], [0.0] * 6, TOPO6,
                                          mass_maps=MAPS6))
    e_flat = ess(FlatInvertiblePhasespace([0.0, 0.0], [0.0] * 6))
    assert e_casc > 0.01
    assert e_casc > 100 * max(e_flat, 1e-12)
