"""Production endpoint fast paths: BasicManager.sample/integrate and the
unweighter must route through the folded/fused samplers correctly (the
fused kernel runs in Pallas interpret mode on CPU)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf_tpu import PWQuadManager
from nf_tpu.flows.fast_eval import make_folded_forward_t
from nf_tpu.training import optimizers, unweight


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def camel_exact():
    g = 0.2 * (math.sqrt(math.pi) / 2) * (math.erf(0.25 / 0.2) + math.erf(0.75 / 0.2))
    return 2 * g * g


# f64 on the CPU suite; under NF_TPU_TEST_BACKEND=tpu the manager runs f32,
# where two separately-jitted graphs legitimately differ at ~1e-6 (XLA
# fusion ordering) — the exact-equality tolerances must track the dtype
def _rtol():
    return 1e-9 if jax.config.jax_enable_x64 else 3e-5


@pytest.fixture(scope="module")
def trained():
    NF = PWQuadManager(n_flow=2, seed=0)
    NF.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(2e-3, 1e-4)
    NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=2000, epochs=25,
        pretty_progressbar=False, mini_batch_size=2000, integrate=False,
        preburn_time=5)
    return NF


def test_integrate_folded_matches_manual_recomputation(trained):
    NF = trained
    nitn, neval, seed = 3, 2048, 7
    sig, err = NF.integrate(camel, nitn, neval, seed=seed, method="folded")

    params, state = NF.best_params
    fwd = make_folded_forward_t(NF._flow, params, state, NF.dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed), nitn)
    means, variances = [], []
    for k in keys:
        w = jax.random.uniform(k, (neval, 2), NF.dtype)
        x, jac = fwd(w)
        fres = np.asarray(camel(x) * jac)
        means.append(fres.mean())
        variances.append(fres.var(ddof=1))
    means, variances = np.asarray(means), np.asarray(variances)
    sig_ref = np.sum(means / variances) / np.sum(1.0 / variances)
    err_ref = math.sqrt(1.0 / np.sum(1.0 / variances)) / math.sqrt(neval * nitn)
    np.testing.assert_allclose(sig, sig_ref, rtol=_rtol())
    np.testing.assert_allclose(err, err_ref, rtol=max(_rtol(), 1e-3))


def test_integrate_folded_accuracy(trained):
    sig, err = trained.integrate(camel, 4, 20000, seed=3, method="folded")
    exact = camel_exact()
    assert abs(sig - exact) < 8 * err + 0.02 * exact


def test_sample_folded_is_eval_mode_map(trained):
    NF = trained
    key = jax.random.PRNGKey(9)
    x_f, jac_f = NF.sample(256, key=key, method="folded")
    params, state = NF.best_params
    fwd = make_folded_forward_t(NF._flow, params, state, NF.dtype)
    w = jax.random.uniform(key, (256, 2), NF.dtype)
    x_m, jac_m = fwd(w)
    tol = 1e-12 if jax.config.jax_enable_x64 else 3e-5
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_m), rtol=tol,
                               atol=tol)
    np.testing.assert_allclose(np.asarray(jac_f), np.asarray(jac_m),
                               rtol=max(tol, 1e-4))


def test_sample_fused_interpret_statistics(trained):
    NF = trained
    x, jac = NF.sample(4096, key=jax.random.PRNGKey(2), method="fused")
    x, jac = np.asarray(x), np.asarray(jac)
    assert x.shape == (4096, 2)
    assert np.isfinite(jac).all()
    assert ((x >= 0) & (x <= 1)).all()
    # E[jac] == 1 for a bijection of the unit cube
    assert abs(jac.mean() - 1.0) < 0.05


def test_integrate_fused_interpret_accuracy(trained):
    sig, err = trained.integrate(camel, 2, 4096, seed=5, method="fused")
    exact = camel_exact()
    assert abs(sig - exact) < 10 * err + 0.05 * exact


def test_generate_unweighted_folded(trained):
    NF = trained
    params, state = NF.best_params
    events, eff, n_over = unweight.generate_unweighted(
        NF._flow, params, state, camel, jax.random.PRNGKey(0), 500,
        batch=4096, method="folded")
    assert events.shape[0] >= 500
    assert 0.0 < eff <= 1.0
    assert ((events >= 0) & (events <= 1)).all()
