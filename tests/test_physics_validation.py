"""Independent physics validation of the Drell-Yan cross-section
(VERDICT r2 item 3).

The collider example's sigma was previously validated only against its own
67M-point uniform self-measurement.  Here the SAME pipeline integrand
(FlatInvertiblePhasespace in tau mode + ToyPDF + Breit-Wigner |M|^2,
examples/collider_2to4.py) is pinned against:

  1. an ANALYTIC reduction computed with scipy.quad — the textbook
     factorization sigma = int dtau dy f_u(x1) f_ubar(x2) sigma_hat(s_hat)
     with the 2-body phase-space volume 1/(8pi), the lab-frame pT /
     rapidity acceptance (including the reference's abs(max eta) quirk,
     generator.py rap cut), the x > 1e-4 PDF cutoff and the 1/(2 s_hat)
     flux — evaluated to ~1e-5 relative accuracy with a Breit-Wigner tan
     substitution;
  2. a tailored importance-sampled MC of the pipeline itself (Cauchy in
     tau), accurate to ~0.3%, which validates generateKinematics_batch
     end-to-end rather than the formula;
  3. the in-repo jax VEGAS on the identical cube integrand;
  4. a short NIS training + integrate(combine="mean").

pb conversion per reference utils/experiment_mg.py:62-63.
"""

import math

import numpy as np
import pytest
from scipy import integrate as sci

import jax
import jax.numpy as jnp

from nf_tpu import PWQuadManager, FlatInvertiblePhasespace
from nf_tpu.phasespace import lorentz
from nf_tpu.phasespace.pdf import ToyPDF
from nf_tpu.training import optimizers

E = 2000.0
S = E * E
MZ2 = 91.188 ** 2
GZ = 2.4952
GAM2 = MZ2 * GZ ** 2
TAU_MIN = (1.0 / E) ** 2
GEV2_TO_PB = 2.56819e-9


def make_integrand():
    gen = FlatInvertiblePhasespace([0.0, 0.0], [0.0, 0.0], pdf=ToyPDF(),
                                   pdf_active=True, tau=True)

    def integrand(w):
        momenta, wgt = gen.generateKinematics_batch(
            E, w, pT_mincut=10.0, rap_maxcut=2.4, pdgs=(2, -2))
        shat = lorentz.square(momenta[:, 0, :] + momenta[:, 1, :])
        me = 1e4 / ((shat - MZ2) ** 2 + GAM2)
        return me * wgt

    return gen, integrand


# ---------------------------------------------------------------------------
# 1. analytic reduction (scipy)
# ---------------------------------------------------------------------------

def _f_u(x):
    return 1.4 * x ** 0.5 * (1 - x) ** 3 / x


def _f_ubar(x):
    return 0.15 * x ** -0.2 * (1 - x) ** 6 / x


def _acceptance(shat, y):
    """Allowed-cos(theta) fraction for pT >= 10 on both leptons and the
    reference rapidity quirk |y + |atanh c|| <= 2.4 (abs of the MAX
    pseudorapidity, generator.py)."""
    arg = 1.0 - 400.0 / shat
    if arg <= 0:
        return 0.0
    eta_pt = np.arctanh(min(np.sqrt(arg), 1 - 1e-15))
    u_hi = min(2.4 - y, eta_pt)
    u_lo = max(0.0, -2.4 - y)
    return max(0.0, np.tanh(u_hi) - np.tanh(u_lo))


def analytic_sigma():
    def integrand_y(y, tau):
        x1 = math.sqrt(tau) * math.exp(y)
        x2 = math.sqrt(tau) * math.exp(-y)
        if x1 < 1e-4 or x2 < 1e-4 or x1 > 1 or x2 > 1:
            return 0.0
        shat = tau * S
        me = 1e4 / ((shat - MZ2) ** 2 + GAM2)
        return _f_u(x1) * _f_ubar(x2) * me / (2.0 * shat) \
            * _acceptance(shat, y) / (8.0 * np.pi)

    def inner(tau):
        ymax = -0.5 * math.log(tau)
        shat = tau * S
        arg = 1.0 - 400.0 / shat
        pts = [p for p in (
            -2.4, 2.4,
            2.4 - (np.arctanh(np.sqrt(arg)) if 0 < arg < 1 else 0.0))
            if -ymax < p < ymax]
        v, _ = sci.quad(integrand_y, -ymax, ymax, args=(tau,), limit=300,
                        points=sorted(pts) or None, epsabs=1e-13,
                        epsrel=1e-10)
        return v

    tau_star = MZ2 / S
    w_tau = math.sqrt(GAM2) / S

    def outer(t):
        tau = tau_star + w_tau * math.tan(t)
        return inner(tau) * w_tau / math.cos(t) ** 2

    def t_of(tau):
        return math.atan((tau - tau_star) / w_tau)

    t_lo, t_hi = t_of(400.0 / S), t_of(1.0)
    pieces = sorted({t_lo, t_of(tau_star - 50 * w_tau), -1.0,
                     1.0, t_of(tau_star + 50 * w_tau), t_of(0.01),
                     t_of(0.1), t_hi})
    pieces = [p for p in pieces if t_lo <= p <= t_hi]
    tot = 0.0
    for a, b in zip(pieces[:-1], pieces[1:]):
        v, _ = sci.quad(outer, a, b, limit=400, epsabs=1e-13, epsrel=1e-9)
        tot += v
    return tot


@pytest.fixture(scope="module")
def sigma_ref():
    sig = analytic_sigma()
    # pb regression pin: independently reproduces the example's 67M-point
    # self-measurement 3.639 +/- 0.032 pb
    assert abs(sig / GEV2_TO_PB - 3.6568) < 0.01
    return sig


def test_pipeline_matches_analytic_sigma(sigma_ref):
    """Importance-sampled MC of the ACTUAL pipeline integrand (Cauchy in
    tau resolves the Z peak) agrees with the analytic value to <1%."""
    gen, integrand = make_integrand()
    n_flow = gen.nDimPhaseSpace() + 2
    assert n_flow == 4

    tau_star = MZ2 / S
    w_tau = math.sqrt(GAM2) / S
    lo = math.atan((TAU_MIN - tau_star) / w_tau)
    hi = math.atan((1.0 - tau_star) / w_tau)

    jit_integrand = jax.jit(integrand)
    rng = np.random.default_rng(0)
    total_w, total_w2, n_tot = 0.0, 0.0, 0
    for _ in range(4):
        n = 1 << 19
        u = rng.random((n, n_flow))
        t = lo + u[:, -2] * (hi - lo)
        tau = tau_star + w_tau * np.tan(t)
        # q(tau) truncated-Cauchy density; r_tau = pipeline's cube coord
        q_tau = 1.0 / ((hi - lo) * w_tau * (1.0 + ((tau - tau_star)
                                                  / w_tau) ** 2))
        w = u.copy()
        w[:, -2] = (tau - TAU_MIN) / (1.0 - TAU_MIN)
        vals = np.asarray(jit_integrand(jnp.asarray(w)))
        # d r_tau / d tau = 1/(1-TAU_MIN); importance weight q in r-space
        iw = vals / (q_tau * (1.0 - TAU_MIN))
        total_w += iw.sum()
        total_w2 += (iw ** 2).sum()
        n_tot += n
    est = total_w / n_tot
    err = math.sqrt(max(total_w2 / n_tot - est ** 2, 0.0) / n_tot)
    assert abs(est - sigma_ref) < max(6 * err, 0.01 * sigma_ref), \
        (est / GEV2_TO_PB, sigma_ref / GEV2_TO_PB, err / GEV2_TO_PB)


@pytest.mark.slow
def test_vegas_matches_analytic_sigma(sigma_ref):
    """In-repo jax VEGAS on the identical cube integrand (reference
    baseline protocol, experiment_mgv.py) agrees within errors."""
    from nf_tpu.training.vegas import VegasIntegrator
    _, integrand = make_integrand()
    veg = VegasIntegrator(4, n_bins=64, seed=3)
    veg.run(integrand, nitn=8, neval=20000)      # adaptation (discarded)
    sig, err = veg.run(integrand, nitn=10, neval=20000)
    assert abs(sig - sigma_ref) < max(8 * err, 0.1 * sigma_ref), \
        (sig / GEV2_TO_PB, sigma_ref / GEV2_TO_PB, err / GEV2_TO_PB)


@pytest.mark.slow
def test_nis_matches_analytic_sigma(sigma_ref):
    """Short NIS training + integrate(combine='mean') on the Drell-Yan
    integrand agrees within errors (the r2 'Done' criterion: NIS, VEGAS
    and the analytic value in one regression test)."""
    _, integrand = make_integrand()
    NF = PWQuadManager(n_flow=4, seed=0)
    NF.create_model(4, 32, [32] * 2)
    NF._train_variance_forward_seq(
        integrand, optimizers.adamax(2e-3, 1e-4), log=False,
        batch_size=16384, epochs=60, pretty_progressbar=False,
        mini_batch_size=16384, integrate=False, preburn_time=0,
        kill_counter=100, loss_mode="kl")
    sig, err = NF.integrate(integrand, 8, 1 << 17, seed=11, combine="mean")
    assert err > 0
    # mean-combine is unbiased; the tail makes err estimates noisy, so the
    # gate is 6 sigma with a 10% floor
    assert abs(sig - sigma_ref) < max(6 * err, 0.1 * sigma_ref), \
        (sig / GEV2_TO_PB, sigma_ref / GEV2_TO_PB, err / GEV2_TO_PB)
