"""Chunked multi-epoch training (epochs_per_sync > 1)."""

import math

import numpy as np

import jax.numpy as jnp

from nf_tpu import PWQuadManager
from nf_tpu.training import optimizers


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def camel_exact():
    g = 0.2 * (math.sqrt(math.pi) / 2) * (math.erf(0.25 / 0.2) + math.erf(0.75 / 0.2))
    return 2 * g * g


def test_chunked_training_converges_and_fills_accumulators():
    NF = PWQuadManager(n_flow=2, seed=0)
    NF.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(2e-3)
    sig, err = NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=2000, epochs=40,
        pretty_progressbar=False, mini_batch_size=1000, integrate=True,
        preburn_time=5, kill_counter=100, epochs_per_sync=8)
    assert len(NF.history) == 40
    assert np.all(NF._err_hist > 0)
    assert NF.best_loss < NF.int_loss
    exact = camel_exact()
    assert abs(sig - exact) < 6 * err + 0.05 * exact
    # best snapshot usable
    x, jac = NF.sample(256)
    assert np.all(np.isfinite(np.asarray(jac)))


def test_chunked_equals_per_epoch_without_early_stop():
    """Chunking changes only the RNG chunking of keys, not the math: with
    preburn disabled and no early stop, both reach similar losses and both
    machineries leave consistent bookkeeping."""
    results = {}
    for k in (1, 5):
        NF = PWQuadManager(n_flow=2, seed=3)
        NF.create_model(2, 4, [4] * 2)
        opt = optimizers.adamax(2e-3)
        NF._train_variance_forward_seq(
            camel, opt, log=False, batch_size=1000, epochs=20,
            pretty_progressbar=False, mini_batch_size=1000, integrate=False,
            preburn_time=0, kill_counter=100, epochs_per_sync=k)
        results[k] = (len(NF.history), NF.best_func_count)
    assert results[1] == results[5]


def test_chunked_respects_kill_counter():
    """With lr=0 the loss is a random walk around a constant, so a
    non-improving streak longer than kill_counter occurs quickly; the
    chunked path must stop early like the per-epoch path."""
    NF = PWQuadManager(n_flow=2, seed=4)
    NF.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(0.0)
    NF._train_variance_forward_seq(
        camel, opt, log=False,
        batch_size=500, epochs=100, pretty_progressbar=False,
        mini_batch_size=500, integrate=False, preburn_time=0,
        kill_counter=2, epochs_per_sync=10)
    # stopped well before 100 epochs
    assert len(NF.history) < 100
