"""Targeted tests for the training state machine's parity-critical paths:
preburn transitions, kill-counter, stale-save early stop, tail integration,
and the best-model eval-mode side effect (reference manager.py:307-346)."""

import jax
import jax.numpy as jnp
import numpy as np

from nf_tpu import PWQuadManager
from nf_tpu.training import optimizers


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def _train(NF, **kw):
    args = dict(log=False, batch_size=500, epochs=30,
                pretty_progressbar=False, mini_batch_size=500,
                integrate=False, preburn_time=0, kill_counter=100)
    args.update(kw)
    opt = optimizers.adamax(kw.pop("lr", 2e-3) if "lr" in kw else 2e-3)
    return NF._train_variance_forward_seq(camel, opt, **args)


def test_preburn_exits_by_timeout():
    """preburner turns off after preburn_time epochs at the latest
    (reference manager.py:325-327); best-model updates only begin then."""
    NF = PWQuadManager(n_flow=2, seed=0)
    NF.create_model(2, 4, [4] * 2)
    _train(NF, preburn_time=5, epochs=20)
    # epochs 0..5 are preburn (no best updates); best_epoch must be later
    # than the preburn window unless no improvement ever happened
    assert NF.best_epoch == 0 or NF.best_epoch > 5 or NF.best_loss < NF.int_loss


def test_no_preburn_updates_best_from_epoch_zero():
    NF = PWQuadManager(n_flow=2, seed=1)
    NF.create_model(2, 4, [4] * 2)
    _train(NF, preburn_time=0, epochs=15)
    assert len(NF.history) == 15


def test_kill_counter_breaks_per_epoch_path():
    NF = PWQuadManager(n_flow=2, seed=2)
    NF.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(0.0)  # loss is a pure random walk
    NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=400, epochs=100,
        pretty_progressbar=False, mini_batch_size=400, integrate=False,
        preburn_time=0, kill_counter=2)
    assert len(NF.history) < 100


def test_kill_counter_in_preburn_only_ends_preburn():
    """During preburn a kill-counter overflow flips preburner off instead of
    stopping training (reference manager.py:311-313)."""
    NF = PWQuadManager(n_flow=2, seed=3)
    NF.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(0.0)
    NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=400, epochs=40,
        pretty_progressbar=False, mini_batch_size=400, integrate=False,
        preburn_time=1000, kill_counter=2)
    # training continued past the first kill (one kill ends preburn, the
    # second kills the run): strictly more epochs than a single streak
    assert len(NF.history) > 3


def test_tail_integration_fills_remaining_epochs_and_flips_eval():
    NF = PWQuadManager(n_flow=2, seed=4)
    NF.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(0.0)
    sig, err = NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=400, epochs=50,
        pretty_progressbar=False, mini_batch_size=400, integrate=True,
        preburn_time=0, kill_counter=2)
    # early stop happened, tail integration filled the rest
    assert len(NF.history) < 50
    assert np.all(NF._err_hist > 0)
    assert NF.best_eval_mode  # reference flips best_model to eval in the tail
    assert np.isfinite(sig) and np.isfinite(err)
    # sample() must follow the eval-mode flag now
    x1, j1 = NF.sample(64, key=jax.random.PRNGKey(0))
    x2, j2 = NF.sample(64, key=jax.random.PRNGKey(0), train=False)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_stale_save_early_stop():
    """With impr_ratio=1 the stale check fires at the first check_time
    multiple past preburn_time+1 (reference manager.py:317-318)."""
    NF = PWQuadManager(n_flow=2, seed=5)
    NF.create_model(2, 4, [4] * 2)
    opt = optimizers.adamax(2e-3)
    NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=400, epochs=200,
        pretty_progressbar=False, mini_batch_size=400, integrate=False,
        preburn_time=20, kill_counter=1000, impr_ratio=1.0)
    # check_time == preburn_time == 20 -> stop by epoch ~40
    assert len(NF.history) <= 45


def test_history_and_func_count_bookkeeping():
    NF = PWQuadManager(n_flow=2, seed=6)
    NF.create_model(2, 4, [4] * 2)
    _train(NF, epochs=12, batch_size=600, mini_batch_size=200)
    assert len(NF.history) == 12
    # initial 2*batch*n_flow + batch per epoch
    assert NF.best_func_count == 2 * 600 * 2 + 12 * 600
