"""Randomized-QMC integration (utils/qmc.py + integrate(method='qmc'))."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from nf_tpu import PWQuadManager
from nf_tpu.utils.qmc import sobol_latents


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def camel_exact():
    g = 0.2 * (math.sqrt(math.pi) / 2) * (math.erf(0.25 / 0.2) + math.erf(0.75 / 0.2))
    return 2 * g * g


def test_sobol_latents_properties():
    w = sobol_latents(1000, 3, seed=0)
    assert w.shape == (1024, 3)  # rounded up to 2^10
    assert (w > 0).all() and (w < 1).all()
    # deterministic per seed, different across seeds
    np.testing.assert_array_equal(w, sobol_latents(1000, 3, seed=0))
    assert not np.array_equal(w, sobol_latents(1000, 3, seed=1))
    # balance: each dimension's mean is extremely close to 1/2 for Sobol
    assert np.abs(w.mean(0) - 0.5).max() < 1e-3


def test_qmc_integrate_beats_mc_on_camel():
    """Same budget (8 x 4096): the RQMC standard error must be well below
    the plain-MC standard error, and the estimate must be accurate."""
    NF = PWQuadManager(n_flow=2, seed=0)
    NF.create_model(2, 4, [4] * 2)  # untrained: map ~ smooth, QMC-friendly

    sig_mc, err_mc = NF.integrate(camel, 8, 4096, seed=3, method="folded",
                                  combine="mean")
    sig_q, err_q = NF.integrate(camel, 8, 4096, seed=3, method="qmc")

    exact = camel_exact()
    assert abs(sig_q - exact) < 8 * err_q + 1e-3 * exact
    assert err_q < 0.5 * err_mc, (err_q, err_mc)


def test_qmc_integrate_trained_flow():
    from nf_tpu.training import optimizers
    NF = PWQuadManager(n_flow=2, seed=1)
    NF.create_model(2, 4, [4] * 2)
    NF._train_variance_forward_seq(
        camel, optimizers.adamax(2e-3), log=False, batch_size=1500,
        epochs=20, pretty_progressbar=False, mini_batch_size=1500,
        integrate=False, preburn_time=0)
    sig, err = NF.integrate(camel, 6, 8192, seed=7, method="qmc")
    exact = camel_exact()
    assert abs(sig - exact) < 8 * err + 2e-3 * exact
    assert err < 1e-3  # trained map + QMC: sub-permille standard error


def test_sobol_latents_strictly_below_one_f32():
    """The (0,1) guard must survive the f32 cast (ADVICE r2: clipping to
    1-1e-9 before an f32 cast rounds to exactly 1.0)."""
    import numpy as np
    from nf_tpu.utils.qmc import sobol_latents
    for dt in (np.float32, np.float64):
        pts = sobol_latents(4096, 5, seed=3, dtype=dt)
        assert pts.dtype == np.dtype(dt)
        assert pts.max() < dt(1.0)
        assert pts.min() > 0.0


def test_device_sobol_matches_scipy_unscrambled():
    """The on-device gray-code XOR ladder reproduces scipy's unscrambled
    Sobol sequence bit-exactly (same Joe-Kuo direction numbers)."""
    import numpy as np
    from scipy.stats import qmc as sq
    from nf_tpu.utils.qmc import make_device_sobol
    n, dim = 256, 5
    gen = make_device_sobol(dim, scramble=False)
    dev = np.asarray(gen(n, 0))
    host = sq.Sobol(dim, scramble=False, bits=32).random(n)
    # device uses the top 24 bits + half-ulp centering
    np.testing.assert_allclose(dev, host, atol=2.0 ** -24)


def test_device_sobol_owen_scramble_preserves_net():
    """Owen scrambling must preserve the digital-net property: in every
    dimension, the first 2^m points land one per dyadic interval of size
    2^-m; and different seeds give different point sets."""
    import numpy as np
    from nf_tpu.utils.qmc import make_device_sobol
    n, dim = 512, 4
    gen = make_device_sobol(dim, scramble=True)
    a = np.asarray(gen(n, 12345))
    b = np.asarray(gen(n, 999))
    assert (a > 0).all() and (a < 1).all()
    assert np.abs(a - b).max() > 0.1  # genuinely different scramblings
    for d in range(dim):
        counts = np.bincount((a[:, d] * n).astype(int), minlength=n)
        assert (counts == 1).all(), f"dim {d}: not a (0,m,1)-net"


def test_device_rqmc_integrates_and_beats_mc():
    import numpy as np
    import jax.numpy as jnp
    from nf_tpu.utils.qmc import rqmc_integrate_device, rqmc_integrate

    def eval_mean(w):
        # smooth separable integrand, exact integral = 1
        return jnp.mean(jnp.prod(1.0 + 0.5 * (2.0 * w - 1.0), axis=1))

    sig, err, n = rqmc_integrate_device(eval_mean, 3, 8, 4096, seed=7)
    assert n == 4096
    assert abs(sig - 1.0) < max(6 * err, 2e-4)
    # error comparable to the host Owen-scrambled generator's
    sig_h, err_h, _ = rqmc_integrate(eval_mean, 3, 8, 4096, 7,
                                     dtype=np.float32)
    assert err < 20 * max(err_h, 1e-7)
    # and far below the MC sigma/sqrt(N) for this integrand (~1.5e-3)
    assert err < 5e-4
