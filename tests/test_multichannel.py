"""Learned multi-channel (per-channel flows + on-device Kleiss-Pittau).

Pins training/multichannel.py:
  * with identity flows the mixture density reduces exactly to the
    fixed-alpha combination (same weights statistics as
    topology.multichannel_integrand);
  * the estimator stays unbiased while flows AND alphas train (every
    epoch's integral agrees with the fixed-alpha reference);
  * training raises the mixture ESS on a genuinely two-channel target
    (competing resonance pairings) and the Kleiss-Pittau update shifts
    alpha toward the channel the matrix element is resonant in.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.topology import (
    BreitWignerSMap,
    ResonanceDecayPhasespace,
    multichannel_integrand,
)
from nf_tpu.training import multichannel as mc
from nf_tpu.training import optimizers

E = 400.0
MZ, GZ = 91.188, 2.4952
MZP, GZP = 180.0, 8.0
MZ2, GAM2 = MZ ** 2, (MZ * GZ) ** 2
MZP2, GAMP2 = MZP ** 2, (MZP * GZP) ** 2
# puts the Z' pairing at a comparable share of the cross-section
ZP_BOOST = 300.0


def pair_mass2(m, i, j):
    f = m[:, 2:, :]
    return lorentz.square(f[:, i] + f[:, j])


def me_competing(m):
    """Resonant in BOTH the (01)(23) Z pairing and the (02)(13) Z'
    pairing — no single tree channel flattens it."""
    s01, s23 = pair_mass2(m, 0, 1), pair_mass2(m, 2, 3)
    s02, s13 = pair_mass2(m, 0, 2), pair_mass2(m, 1, 3)
    return (1e4 / ((s01 - MZ2) ** 2 + GAM2)
            * 1e4 / ((s23 - MZ2) ** 2 + GAM2)
            + ZP_BOOST * 1e4 / ((s02 - MZP2) ** 2 + GAMP2)
            * 1e4 / ((s13 - MZP2) ** 2 + GAMP2))


def me_single(m):
    s01, s23 = pair_mass2(m, 0, 1), pair_mass2(m, 2, 3)
    return 1e4 / ((s01 - MZ2) ** 2 + GAM2) \
        * 1e4 / ((s23 - MZ2) ** 2 + GAM2)


@pytest.fixture(scope="module")
def channels():
    ch1 = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 1), (2, 3)),
        mass_maps={(0, 1): BreitWignerSMap(MZ, GZ),
                   (2, 3): BreitWignerSMap(MZ, GZ)})
    ch2 = ResonanceDecayPhasespace(
        [0.0, 0.0], [0.0] * 4, ((0, 2), (1, 3)),
        mass_maps={(0, 2): BreitWignerSMap(MZP, GZP),
                   (1, 3): BreitWignerSMap(MZP, GZP)})
    return [ch1, ch2]


def fixed_alpha_reference(channels, me, alphas, n):
    g = multichannel_integrand(me, channels, list(alphas), E)
    n_lat = 1 + channels[0].nDimPhaseSpace()
    w = g(jax.random.uniform(jax.random.PRNGKey(2), (n, n_lat),
                             jnp.float64))
    w = np.asarray(w)
    return w.mean(), w.std(ddof=1) / np.sqrt(n)


@pytest.mark.slow
def test_identity_flows_match_fixed_alpha(channels):
    """Fresh (identity) flows: the learned-mixture weights have the same
    integral and ESS as the fixed-alpha combination."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    alphas = jnp.asarray([0.5, 0.5])
    w, aux = jax.jit(lambda p: mc.mixture_weights(
        channels, flows, p, ss, me_competing, E,
        jax.random.PRNGKey(1), 8192, alphas))(ps)
    integral, err, ess = mc.combine_stratified(w, alphas)
    ref, ref_err = fixed_alpha_reference(channels, me_competing,
                                         [0.5, 0.5], 1 << 16)
    assert abs(float(integral) - ref) < 5 * np.hypot(float(err), ref_err)
    # identity flows: density fractions sum to 1 where weights are live
    r_sum = np.asarray(jnp.sum(jnp.asarray([0.5, 0.5])[:, None, None]
                               * aux["r"], axis=0))
    live = np.asarray(w) != 0
    np.testing.assert_allclose(r_sum[live], 1.0, atol=1e-9)


@pytest.mark.slow
def test_training_improves_ess_and_stays_unbiased(channels):
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    out = mc.train_multichannel(
        channels, flows, ps, ss, me_competing, E,
        optimizers.adamax(2e-3, 1e-4), jax.random.PRNGKey(3),
        batch_per_channel=2048, epochs=30)
    h = out["history"]
    assert out["best_ess"] > min(1.5 * h["ess"][0], h["ess"][0] + 0.15)
    assert out["best_ess"] > 0.9
    assert h["loss"][-5:].mean() < 0.5 * h["loss"][0]
    # every epoch's integral is unbiased: pin the history mean against a
    # high-stat fixed-alpha reference
    ref, ref_err = fixed_alpha_reference(channels, me_competing,
                                         [0.5, 0.5], 1 << 17)
    hist_err = h["integral"].std(ddof=1) / np.sqrt(len(h["integral"]))
    assert abs(h["integral"].mean() - ref) < 5 * np.hypot(hist_err, ref_err)
    # eval at the best snapshot agrees too
    w, _ = jax.jit(lambda p, a: mc.multichannel_sample(
        channels, flows, p, ss, me_competing, E, jax.random.PRNGKey(9),
        1 << 14, a))(out["best_params"], jnp.asarray(out["best_alphas"]))
    integral, err, ess = mc.combine_stratified(
        w, jnp.asarray(out["best_alphas"]))
    assert abs(float(integral) - ref) < 5 * np.hypot(float(err), ref_err)
    assert float(ess) > 0.5


@pytest.mark.slow
def test_alphas_move_toward_resonant_channel(channels):
    """ME resonant only in channel 1's pairing: Kleiss-Pittau drives
    alpha_1 up from a mis-weighted start."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    out = mc.train_multichannel(
        channels, flows, ps, ss, me_single, E,
        optimizers.adamax(1e-3), jax.random.PRNGKey(4),
        alphas=[0.3, 0.7], batch_per_channel=1024, epochs=15,
        alpha_damping=1.0, alpha_floor=5e-3)
    assert out["alphas"][0] > 0.8
    # alphas stay positive and normalized throughout
    a_hist = out["history"]["alphas"]
    np.testing.assert_allclose(a_hist.sum(axis=1), 1.0, atol=1e-9)
    # the floor applies before re-normalization (same convention as the
    # host optimize_alphas), so it is approximate from above
    assert a_hist.min() >= 5e-3 * 0.99


@pytest.mark.slow
def test_multichannel_mesh_equivalence(channels):
    """mesh= shards each channel's batch over 'dp' (GSPMD); weights and a
    short training run match the single-device path bit-for-bit (the PRNG
    stream is sharding-independent)."""
    from nf_tpu.parallel import make_mesh
    mesh = make_mesh()
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    alphas = jnp.asarray([0.5, 0.5])

    w0, _ = jax.jit(lambda p: mc.mixture_weights(
        channels, flows, p, ss, me_competing, E, jax.random.PRNGKey(1),
        8192, alphas))(ps)
    w1, _ = jax.jit(lambda p: mc.mixture_weights(
        channels, flows, p, ss, me_competing, E, jax.random.PRNGKey(1),
        8192, alphas, mesh=mesh))(ps)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), rtol=1e-12)

    runs = [mc.train_multichannel(
        channels, flows, ps, ss, me_competing, E,
        optimizers.adamax(2e-3, 1e-4), jax.random.PRNGKey(3),
        batch_per_channel=2048, epochs=3, mesh=m)
        for m in (None, mesh)]
    np.testing.assert_allclose(runs[1]["history"]["ess"],
                               runs[0]["history"]["ess"], rtol=1e-10)
    np.testing.assert_allclose(runs[1]["history"]["integral"],
                               runs[0]["history"]["integral"], rtol=1e-10)
    for a, b in zip(jax.tree.leaves(runs[0]["params"]),
                    jax.tree.leaves(runs[1]["params"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-10, atol=1e-12)


def test_multichannel_unweighting(channels):
    """Accept-reject from the equal-strata mixture: the unweighted event
    distribution matches the weighted expectation (resonance-region
    fraction), with sane efficiency bookkeeping."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    alphas = jnp.asarray([0.6, 0.4])

    # weighted reference for the indicator fraction
    w, aux = jax.jit(lambda p: mc.mixture_weights(
        channels, flows, p, ss, me_competing, E, jax.random.PRNGKey(11),
        1 << 14, alphas, with_kinematics=True))(ps)
    mom = aux["momenta"]

    def z_frac(momenta):
        s01 = np.asarray(pair_mass2(momenta, 0, 1))
        return np.abs(np.sqrt(np.maximum(s01, 0.0)) - MZ) < 5 * GZ

    ind = z_frac(mom.reshape(-1, mom.shape[2], 4)).reshape(w.shape)
    wA = np.asarray(w) * ind
    num = float(jnp.sum(alphas * jnp.asarray(wA).mean(axis=1)))
    den = float(jnp.sum(alphas * jnp.mean(w, axis=1)))
    frac_weighted = num / den

    events, xbs, eff, n_over = mc.multichannel_unweight(
        channels, flows, ps, ss, me_competing, E, jax.random.PRNGKey(12),
        alphas, n_events=3000, batch_per_channel=4096,
        wmax_quantile=0.9999)
    assert len(events) >= 3000
    assert 0.0 < eff <= 1.0
    assert xbs.shape == (len(events), 2)
    frac_unweighted = z_frac(jnp.asarray(events)).mean()
    sigma = np.sqrt(frac_weighted * (1 - frac_weighted) / len(events)) \
        + 0.01
    assert abs(frac_unweighted - frac_weighted) < 6 * sigma
    # events conserve momentum and are COM-frame
    tot = np.asarray(events[:, 2:, :].sum(axis=1)
                     - events[:, :2, :].sum(axis=1))
    np.testing.assert_allclose(tot, 0.0, atol=1e-6)


@pytest.mark.slow
def test_multichannel_unweighting_per_channel_max(channels):
    """Per-channel-max unweighting: the accepted distribution still
    matches the weighted expectation (exactness does not depend on
    per-channel cross-section estimates) and the efficiency beats the
    global-max scheme (bounded by ``C*max(a_k w_k)/sum(a_k w_k)``)."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    alphas = jnp.asarray([0.6, 0.4])

    w, aux = jax.jit(lambda p: mc.mixture_weights(
        channels, flows, p, ss, me_competing, E, jax.random.PRNGKey(11),
        1 << 14, alphas, with_kinematics=True))(ps)
    mom = aux["momenta"]

    def z_frac(momenta):
        s01 = np.asarray(pair_mass2(momenta, 0, 1))
        return np.abs(np.sqrt(np.maximum(s01, 0.0)) - MZ) < 5 * GZ

    ind = z_frac(mom.reshape(-1, mom.shape[2], 4)).reshape(w.shape)
    wA = np.asarray(w) * ind
    num = float(jnp.sum(alphas * jnp.asarray(wA).mean(axis=1)))
    den = float(jnp.sum(alphas * jnp.mean(w, axis=1)))
    frac_weighted = num / den

    ev_g, _, eff_g, _ = mc.multichannel_unweight(
        channels, flows, ps, ss, me_competing, E, jax.random.PRNGKey(12),
        alphas, n_events=3000, batch_per_channel=4096,
        wmax_quantile=1.0)
    events, xbs, eff, n_over = mc.multichannel_unweight(
        channels, flows, ps, ss, me_competing, E, jax.random.PRNGKey(12),
        alphas, n_events=3000, batch_per_channel=4096,
        wmax_quantile=1.0, per_channel_max=True)
    assert len(events) >= 3000
    assert 0.0 < eff <= 1.0
    assert xbs.shape == (len(events), 2)
    # the whole point: with STRICT pilot maxima (wmax_quantile=1) the
    # per-channel bounds are never worse than the global max — the
    # guarantee only holds at q=1 (truncated quantiles can favor the
    # global pooled budget, see docs/PERFORMANCE.md); small slack for
    # pilot-batch noise
    assert eff >= 0.9 * eff_g
    frac_unweighted = z_frac(jnp.asarray(events)).mean()
    sigma = np.sqrt(frac_weighted * (1 - frac_weighted) / len(events)) \
        + 0.01
    assert abs(frac_unweighted - frac_weighted) < 6 * sigma
    tot = np.asarray(events[:, 2:, :].sum(axis=1)
                     - events[:, :2, :].sum(axis=1))
    np.testing.assert_allclose(tot, 0.0, atol=1e-6)
    # only_channel restriction agrees with the stratified path per source
    w1, aux1 = jax.jit(lambda p: mc.mixture_weights(
        channels, flows, p, ss, me_competing, E, jax.random.PRNGKey(11),
        1 << 12, alphas, only_channel=1))(ps)
    w_all, _ = jax.jit(lambda p: mc.mixture_weights(
        channels, flows, p, ss, me_competing, E, jax.random.PRNGKey(11),
        1 << 12, alphas))(ps)
    np.testing.assert_allclose(np.asarray(w1[0]), np.asarray(w_all[1]),
                               rtol=1e-12)


@pytest.mark.slow
def test_multichannel_partial_unweighting(channels):
    """Partial unweighting (MadGraph/MadNIS overweight treatment): the
    WEIGHTED accepted sample reproduces the weighted expectation exactly
    even at an aggressive quantile, weights are >= 1, and the Kish
    effective efficiency beats the plain accept rate of the same
    truncated scheme.  Composes with per_channel_max."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    alphas = jnp.asarray([0.6, 0.4])

    w, aux = jax.jit(lambda p: mc.mixture_weights(
        channels, flows, p, ss, me_competing, E, jax.random.PRNGKey(11),
        1 << 14, alphas, with_kinematics=True))(ps)
    mom = aux["momenta"]

    def z_frac(momenta, wts=None):
        s01 = np.asarray(pair_mass2(momenta, 0, 1))
        ind = np.abs(np.sqrt(np.maximum(s01, 0.0)) - MZ) < 5 * GZ
        if wts is None:
            return ind
        return float((ind * wts).sum() / wts.sum())

    ind = z_frac(mom.reshape(-1, mom.shape[2], 4)).reshape(w.shape)
    wA = np.asarray(w) * ind
    num = float(jnp.sum(alphas * jnp.asarray(wA).mean(axis=1)))
    den = float(jnp.sum(alphas * jnp.mean(w, axis=1)))
    frac_weighted = num / den

    for pcm in (False, True):
        events, xbs, wts, info = mc.multichannel_unweight(
            channels, flows, ps, ss, me_competing, E,
            jax.random.PRNGKey(12), alphas, n_events=3000,
            batch_per_channel=4096, wmax_quantile=0.95,
            partial_unweight=True, per_channel_max=pcm)
        assert len(events) == len(wts) >= 3000
        assert np.all(wts >= 1.0)
        assert set(info) == {"eff", "accept_rate", "n_overweight", "w_max"}
        assert 0.0 < info["eff"] <= info["accept_rate"] + 1e-12
        assert info["n_overweight"] > 0  # the quantile actually truncated
        # exactness of the WEIGHTED sample at a truncated quantile
        frac = z_frac(np.asarray(events), wts)
        sigma = np.sqrt(frac_weighted * (1 - frac_weighted)
                        / len(events)) + 0.01
        assert abs(frac - frac_weighted) < 6 * sigma, (pcm, frac,
                                                       frac_weighted)
        assert xbs.shape == (len(events), 2)


def test_multichannel_train_save_resume_exact(channels, tmp_path):
    """save_state / resume_from reproduce the uninterrupted run exactly:
    a run stopped (and checkpointed) after chunk 2 of 4, then resumed,
    yields bit-equal final params, best snapshot, alphas, and history."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    common = dict(alphas=[0.5, 0.5], batch_per_channel=512, epochs=4,
                  loss_mode="kl", epochs_per_call=1)
    opt = optimizers.adamax(5e-3, 1e-4)
    key = jax.random.PRNGKey(9)

    full = mc.train_multichannel(channels, flows, ps, ss, me_competing, E,
                                 opt, key, **common)

    path = str(tmp_path / "mc_ckpt.msgpack")
    part = mc.train_multichannel(channels, flows, ps, ss, me_competing, E,
                                 opt, key, save_state=path,
                                 stop_after_chunks=2, **common)
    assert len(part["history"]["loss"]) == 2  # only the chunks run
    res = mc.train_multichannel(channels, flows, ps, ss, me_competing, E,
                                opt, key, resume_from=path, **common)
    for a, b in zip(jax.tree_util.tree_leaves(full["best_params"]),
                    jax.tree_util.tree_leaves(res["best_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert res["best_ess"] == full["best_ess"]
    np.testing.assert_array_equal(res["alphas"], full["alphas"])
    for k in ("loss", "integral", "ess", "alphas"):
        np.testing.assert_array_equal(res["history"][k],
                                      full["history"][k])
    # config mismatch is rejected
    with pytest.raises(ValueError):
        mc.train_multichannel(channels, flows, ps, ss, me_competing, E,
                              opt, key, resume_from=path,
                              **dict(common, epochs_per_call=2))


def _canon_rows(events, xbs, wts=None):
    """Order-independent canonical form (compaction permutes rows)."""
    ev = np.asarray(events).reshape(len(events), -1)
    order = np.lexsort([ev[:, i] for i in range(ev.shape[1])])
    out = [ev[order], np.asarray(xbs)[order]]
    if wts is not None:
        out.append(np.asarray(wts)[order])
    return out


@pytest.mark.slow
def test_multichannel_unweight_compaction_exact(channels):
    """compact=True transfers device-gathered accepted rows only; the
    accepted SET (events, xb, carried weights, efficiency bookkeeping)
    must equal the uncompacted host loop exactly — for the global and
    per-channel schemes, plain and partial modes, at both per-batch and
    grouped (lax.map) dispatch granularity.  max_batches is divisible by
    batches_per_call and n_events is unreachable so every mode draws the
    identical batch sequence."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    alphas = jnp.asarray([0.6, 0.4])
    kw = dict(n_events=10 ** 9, max_batches=3, batch_per_channel=2048,
              wmax_quantile=0.9995)
    for pcm in (False, True):
        for partial in (False, True):
            base = mc.multichannel_unweight(
                channels, flows, ps, ss, me_competing, E,
                jax.random.PRNGKey(5), alphas, compact=False,
                per_channel_max=pcm, partial_unweight=partial, **kw)
            assert len(base[0]) > 0
            for bpc in (1, 3):
                comp = mc.multichannel_unweight(
                    channels, flows, ps, ss, me_competing, E,
                    jax.random.PRNGKey(5), alphas, compact=True,
                    batches_per_call=bpc, per_channel_max=pcm,
                    partial_unweight=partial, **kw)
                if partial:
                    ev_b, xb_b, wt_b = _canon_rows(*base[:3])
                    ev_c, xb_c, wt_c = _canon_rows(*comp[:3])
                    np.testing.assert_allclose(wt_c, wt_b, rtol=1e-12)
                    info_b, info_c = base[3], comp[3]
                    np.testing.assert_allclose(
                        info_c["eff"], info_b["eff"], rtol=1e-6)
                    assert info_c["n_overweight"] == info_b["n_overweight"]
                else:
                    ev_b, xb_b = _canon_rows(base[0], base[1])
                    ev_c, xb_c = _canon_rows(comp[0], comp[1])
                    np.testing.assert_allclose(comp[2], base[2], rtol=1e-6)
                    assert comp[3] == base[3]
                np.testing.assert_allclose(ev_c, ev_b, rtol=1e-12)
                np.testing.assert_allclose(xb_c, xb_b, rtol=1e-12)


@pytest.mark.slow
def test_multichannel_minibatch_accumulation(channels):
    """mini_batch_per_channel bounds backward memory by scanning
    minibatches within the epoch: the estimator stays unbiased (epoch
    integrals agree with the fixed-alpha reference at identity init),
    training still improves ESS, and non-divisible sizes raise."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    out = mc.train_multichannel(
        channels, flows, ps, ss, me_competing, E,
        optimizers.adamax(2e-3, 1e-4), jax.random.PRNGKey(3),
        batch_per_channel=4096, mini_batch_per_channel=1024, epochs=12)
    hist = out["history"]
    assert np.all(np.isfinite(hist["ess"]))
    ref, ref_err = fixed_alpha_reference(channels, me_competing,
                                         [0.5, 0.5], 1 << 16)
    # epoch-0 runs at identity flows with alphas [0.5, 0.5]
    err0 = ref_err * np.sqrt((1 << 16) / 4096.0)
    assert abs(hist["integral"][0] - ref) < 6 * np.hypot(err0, ref_err)
    assert hist["ess"][-3:].max() > hist["ess"][0]
    with pytest.raises(ValueError):
        mc.train_multichannel(
            channels, flows, ps, ss, me_competing, E,
            optimizers.adamax(2e-3), jax.random.PRNGKey(3),
            batch_per_channel=4096, mini_batch_per_channel=1000, epochs=2)


@pytest.mark.slow
def test_multichannel_epochs_per_call_exact(channels):
    """Splitting the epoch scan across dispatches reuses one compiled
    program and reproduces the single-dispatch run exactly (same epoch
    key stream, same statistics); non-divisible counts raise."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    runs = [mc.train_multichannel(
        channels, flows, ps, ss, me_competing, E,
        optimizers.adamax(2e-3, 1e-4), jax.random.PRNGKey(3),
        batch_per_channel=1024, epochs=6, epochs_per_call=epc)
        for epc in (None, 2)]
    for k in ("loss", "integral", "ess"):
        np.testing.assert_allclose(runs[1]["history"][k],
                                   runs[0]["history"][k], rtol=1e-12)
    for a, b in zip(jax.tree.leaves(runs[0]["params"]),
                    jax.tree.leaves(runs[1]["params"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)
    assert runs[1]["best_ess"] == pytest.approx(runs[0]["best_ess"],
                                                rel=1e-12)
    with pytest.raises(ValueError):
        mc.train_multichannel(
            channels, flows, ps, ss, me_competing, E,
            optimizers.adamax(2e-3), jax.random.PRNGKey(3),
            batch_per_channel=1024, epochs=5, epochs_per_call=2)


@pytest.mark.slow
def test_multichannel_kl_loss_trains_and_stays_unbiased(channels):
    """The reweighted-KL mode (gradients through the learned mixture
    density) improves mixture ESS and keeps every epoch's integral
    unbiased (the weights themselves are loss-mode independent)."""
    flows, ps, ss = mc.build_channel_flows(
        jax.random.PRNGKey(0), channels, 4, 8, (16, 16))
    out = mc.train_multichannel(
        channels, flows, ps, ss, me_competing, E,
        optimizers.adamax(2e-3, 1e-4), jax.random.PRNGKey(3),
        batch_per_channel=2048, epochs=30, loss_mode="kl")
    h = out["history"]
    assert out["best_ess"] > min(1.5 * h["ess"][0], h["ess"][0] + 0.15)
    ref, ref_err = fixed_alpha_reference(channels, me_competing,
                                         [0.5, 0.5], 1 << 17)
    hist_err = h["integral"].std(ddof=1) / np.sqrt(len(h["integral"]))
    assert abs(h["integral"].mean() - ref) < 5 * np.hypot(hist_err, ref_err)
    with pytest.raises(ValueError):
        mc.train_multichannel(
            channels, flows, ps, ss, me_competing, E,
            optimizers.adamax(2e-3), jax.random.PRNGKey(3),
            batch_per_channel=1024, epochs=2, loss_mode="nope")
