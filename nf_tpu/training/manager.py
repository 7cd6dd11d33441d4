"""Managers: model factory + variance-loss trainer + MC integrator.

TPU-native re-design of the reference manager (reference
normalizing_flows/manager.py):

  * model state is an explicit ``(flow_plan, params, bn_state)`` triple;
  * the per-epoch work (minibatch loop, loss, grads, optimizer update,
    integral/error accumulators) is one jit-compiled function using
    ``lax.scan`` over minibatches — the only host round-trip per epoch is the
    scalar loss needed by the early-stopping state machine (which mirrors the
    reference's host-side logic, manager.py:307-327);
  * "best model" snapshots are free: params are immutable pytrees, so the
    reference's ``copy.deepcopy`` (manager.py:186,297) becomes keeping a
    reference;
  * optional data parallelism over a ``jax.sharding.Mesh``: the minibatch is
    sharded over the 'dp' axis with ``with_sharding_constraint`` and XLA's
    SPMD partitioner inserts the psum reductions for loss/integral/variance
    accumulators and the gradient all-reduce over ICI.

Loss-mode semantics, preburn, maxf normalization, and the inverse-variance
combination replicate the reference exactly (manager.py:139-350).  Variances
are *unbiased* throughout (torch.var default).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nf_tpu.flows import factory, model as fmodel
from nf_tpu.training.metrics import MetricsLogger  # noqa: F401  (protocol)


def _uniform(key, shape, dtype):
    return jax.random.uniform(key, shape, dtype=dtype)


def _var(x, ddof=1):
    """Unbiased variance (torch.var default)."""
    return jnp.var(x, ddof=ddof)


class ModelAPI:
    @property
    def model(self):
        if self._flow is not None:
            return self._flow
        raise AttributeError("No model was instantiated")


class BasicManager(ModelAPI):
    """Training and integration engine (reference manager.py:52-405)."""

    def __init__(self, n_flow=2, seed=0, dtype=None):
        self.n_flow = n_flow
        self._flow = None
        self._params = None
        self._bn_state = None
        self.optimizer_object = None
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        self._key = jax.random.PRNGKey(seed)

        self.best_params = None          # (params, bn_state)
        self.best_loss = None
        self.best_eval_mode = False      # see tail-integration note below
        self._mesh = None

    # -- plumbing ----------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _shard_batch(self, w):
        if self._mesh is None:
            return w
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            w, NamedSharding(self._mesh, P("dp")))

    def sample(self, n, key=None, params=None, train=None):
        """Draw ``n`` latent points and map them: returns ``(x, jac)``.

        ``train=None`` follows the reference best-model mode: batch-stats
        BatchNorm unless a tail-integration phase flipped the best model to
        eval (reference manager.py:335,397).
        """
        if key is None:
            key = self._next_key()
        if params is None:
            params, bn_state = self.best_params
        else:
            params, bn_state = params
        if train is None:
            train = not self.best_eval_mode
        w = _uniform(key, (n, self.n_flow), self.dtype)
        x, jac, _ = fmodel.forward(self._flow, params, bn_state, w, train)
        return x, jac

    # -- the trainer (reference manager.py:66-378) --------------------------

    def _train_variance_forward_seq(self, f, optimizer_object, log=True, logdir=None,
                                    batch_size=10000, epochs=10, epoch_start=0,
                                    pretty_progressbar=True, save_best=True, run=None,
                                    dev=0, mini_batch_size=2000, integrate=False,
                                    preburn_time=75, kill_counter=7, impr_ratio=1e-2,
                                    loss_mode="var", seed=None, mesh=None,
                                    pathwise=False):
        """Train with the integrand variance as loss; Jacobian from the forward
        pass (fixed latent sample, gradient through the Jacobian only).

        ``f`` must be jax-traceable: ``f(x: [B, n_flow]) -> [B]``.
        ``optimizer_object`` is an optax GradientTransformation
        (e.g. ``nf_tpu.training.optimizers.adamax(lr, wd)``).
        ``dev`` is accepted for reference-API compatibility and ignored
        (device placement is jax's job).  ``mesh`` enables data parallelism
        over its 'dp' axis.

        ``pathwise=False`` reproduces the reference's forward-variance
        scheme: the mapped sample is detached and the gradient flows through
        the Jacobian only (reference manager.py:234).  ``pathwise=True``
        additionally differentiates through ``f(x)`` (requires a
        differentiable integrand) — a strictly richer gradient that the
        reference cannot compute, markedly better on narrow/peaked targets.
        """
        del dev
        if loss_mode not in ("var", "est"):
            print("Unknown loss function")
            return
        self._mesh = mesh
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)

        flow = self._flow
        dtype = self.dtype
        n_flow = self.n_flow

        check_time = preburn_time if preburn_time > 10 else 50
        mini_batch_size = min(mini_batch_size, batch_size)
        n_minibatches = int(batch_size / mini_batch_size)
        batch_size = batch_size - (batch_size % mini_batch_size)

        integ = np.zeros(epochs + 1)
        err = np.zeros(epochs + 1)

        # ---- PHASE A: initial estimate on raw uniform points
        # (reference manager.py:139-167)
        @jax.jit
        def phase_a(key):
            def round_fn(carry, k):
                maxf, best_loss, best_var, integ0, err0 = carry
                w = self._shard_batch(_uniform(k, (2 * mini_batch_size, n_flow), dtype))
                fres = f(w)
                integ0 += jnp.sum(fres) / (n_flow * 2 * mini_batch_size)
                err0 += _var(fres) / n_flow
                maxf = jnp.maximum(maxf, jnp.max(fres))
                if loss_mode == "var":
                    best_loss += _var(fres / maxf) / n_flow
                else:
                    best_loss += jnp.mean(fres ** 2) / n_flow
                best_var += _var((fres / maxf) ** 2) / 2 * mini_batch_size
                return (maxf, best_loss, best_var, integ0, err0), w
            init = (jnp.zeros((), dtype), jnp.zeros((), dtype),
                    jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), dtype))
            keys = jax.random.split(key, n_flow)
            (maxf, best_loss, best_var, integ0, err0), ws = jax.lax.scan(round_fn, init, keys)
            return maxf, best_loss, best_var, integ0, err0, ws[-1]

        maxf_d, best_loss_d, best_var_d, integ0, err0, last_w = phase_a(self._next_key())
        integ[0] = float(integ0)
        err[0] = float(err0)
        self.best_loss = float(best_loss_d)
        self.best_var = float(best_var_d)
        maxf = maxf_d  # device scalar, closed over by the jitted steps below

        # ---- diagnostics + initial best-model snapshot
        # (reference manager.py:170-196)
        if save_best or log:
            @jax.jit
            def diagnostics(params, bn_state, w):
                x, jacv, new_bn = fmodel.forward(flow, params, bn_state, w, True)
                varJ = jnp.mean(jacv ** 2)
                dkl = jnp.sum(w * (jnp.log(w) - jnp.log(x + 1e-45))) / w.shape[0]
                return varJ, dkl, new_bn
            varJ, dkl, self._bn_state = diagnostics(self._params, self._bn_state, last_w)
            self.varJ = float(varJ)
            self.DKL = float(dkl)
            self.best_params = (self._params, self._bn_state)
            self.best_epoch = 0
            self.best_time = 0
            self.best_loss_rel = 1.0
            self.best_func_count = 2 * batch_size * n_flow
            self.history = []
        if run is not None and log:
            run.log_scalar("training.int_loss", self.best_loss, 0)
        self.int_loss = self.best_loss

        # ---- jitted epoch step (reference manager.py:212-280)
        optimizer = optimizer_object

        def make_epoch_step(preburn: bool):
            @jax.jit
            def epoch_step(params, bn_state, opt_state, key):
                def minibatch(bn_carry, k):
                    w = self._shard_batch(_uniform(k, (mini_batch_size, n_flow), dtype))

                    def loss_fn(p):
                        x, jacv, new_bn = fmodel.forward(flow, p, bn_carry, w, True)
                        if preburn:
                            # loss on LATENT points: flattens J against f
                            # before the map moves (reference manager.py:237-242)
                            fres = f(w)
                            fXJ = fres * jacv / maxf
                            integ_inc = jnp.mean(fres)
                            err_inc = _var(fres)
                        else:
                            x_fixed = x if pathwise else jax.lax.stop_gradient(x)
                            fres = f(x_fixed) * jacv
                            fXJ = fres / maxf
                            integ_inc = jnp.mean(jax.lax.stop_gradient(fres))
                            err_inc = _var(jax.lax.stop_gradient(fres))
                        if loss_mode == "var":
                            l = _var(fXJ)
                        else:
                            l = jnp.mean((fXJ * maxf) ** 2)
                        var_inc = _var(jax.lax.stop_gradient(fXJ) ** 2) / mini_batch_size
                        return l, (new_bn, integ_inc, err_inc, var_inc)

                    (l, (new_bn, ii, ei, vi)), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(params)
                    return new_bn, (l, g, ii, ei, vi)

                keys = jax.random.split(key, n_minibatches)
                bn_state, (ls, gs, iis, eis, vis) = jax.lax.scan(minibatch, bn_state, keys)
                loss = jnp.mean(ls)
                grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), gs)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return (params, bn_state, opt_state, loss,
                        jnp.sum(vis), jnp.mean(iis), jnp.mean(eis))
            return epoch_step

        epoch_step_preburn = make_epoch_step(True)
        epoch_step_normal = make_epoch_step(False)

        params, bn_state = self._params, self._bn_state
        opt_state = optimizer.init(params)

        # ---- host-side epoch loop with the early-stop state machine
        # (reference manager.py:212-327)
        stale_save = 1000.0
        preburner = preburn_time > 0
        counter = 0
        last_loss = 1000.0
        import time as _time
        t_start = _time.time()
        i = epoch_start - 1  # in case epochs == 0

        epoch_iter = range(epoch_start, epoch_start + epochs)
        if pretty_progressbar:
            try:
                from tqdm.auto import tqdm
                epoch_iter = tqdm(epoch_iter, leave=False,
                                  desc="Loss: {0:.3e} | Epoch".format(0.0))
            except ImportError:
                pretty_progressbar = False

        for i in epoch_iter:
            step = epoch_step_preburn if preburner else epoch_step_normal
            params, bn_state, opt_state, loss_d, var_d, integ_e, err_e = step(
                params, bn_state, opt_state, self._next_key())
            loss = float(loss_d)
            # epoch accumulators are indexed relative to epoch_start (the
            # reference would index out of bounds for epoch_start > 0)
            integ[i - epoch_start + 1] += float(integ_e)
            err[i - epoch_start + 1] += float(err_e)

            if save_best or log:
                self.history.append(loss)
                self.best_func_count += batch_size
            if pretty_progressbar:
                epoch_iter.set_description("Loss: {0:.3e} | Epoch".format(loss))
            if run is not None and log:
                run.log_scalar("training.loss", loss, i)
                run.log_scalar("training.loss_rel", loss / self.int_loss, i)

            if (save_best or log) and loss < self.best_loss and not preburner:
                self.best_loss = loss
                self.best_var = float(var_d)
                self.best_loss_rel = loss / self.int_loss
                # post-update snapshot, replicating the reference quirk that
                # deepcopy happens after optimizer.step (manager.py:280,297)
                self.best_params = (params, bn_state)
                self.best_epoch = i
                self.best_time = _time.time() - t_start

            if loss < last_loss:
                counter = 0
            else:
                counter += 1
                if counter > kill_counter and preburner:
                    counter = 0
                    preburner = False
                elif counter > kill_counter:
                    break
            last_loss = loss
            if (i % check_time == 0) and i > (preburn_time + 1) and \
                    float(self.best_loss) / stale_save > (1 - impr_ratio) and not preburner:
                break
            elif i % check_time == 0 and not preburner and \
                    (self.best_loss < self.int_loss or i > 300):
                stale_save = float(self.best_loss)
            if preburner and ((loss < 0.25 * self.best_loss) or i > preburn_time):
                preburner = False

        self._params, self._bn_state = params, bn_state

        # ---- PHASE C: tail integration with the best model in eval mode
        # (reference manager.py:332-346; note the reference's asymmetric
        # integ/sqrt(mini_batch) + std scaling, replicated exactly)
        endpoint = i - epoch_start + 1  # relative epoch count actually run
        if integrate and endpoint < epochs - 1:
            b_params, b_bn = self.best_params
            self.best_eval_mode = True  # reference flips best_model to eval

            @jax.jit
            def tail_epoch(key):
                def minibatch(_, k):
                    w = self._shard_batch(_uniform(k, (mini_batch_size, n_flow), dtype))
                    x, jacv, _ = fmodel.forward(flow, b_params, b_bn, w, False)
                    fres = f(x) * jacv
                    return None, (jnp.mean(fres), jnp.std(fres, ddof=1))
                keys = jax.random.split(key, n_minibatches)
                _, (means, stds) = jax.lax.scan(minibatch, None, keys)
                return (jnp.mean(means) / math.sqrt(mini_batch_size),
                        jnp.mean(stds))

            for s in range(endpoint, epochs):
                ie, ee = tail_epoch(self._next_key())
                integ[s + 1] += float(ie)
                err[s + 1] += float(ee)
                self.best_func_count += batch_size

        # ---- inverse-variance-weighted combination
        # (reference manager.py:349-350). Entries with err == 0 (epochs that
        # never ran) are excluded — the reference would produce NaN there.
        mask = err > 0
        self.integ_tot = float(np.sum(integ[mask] / err[mask]) / np.sum(1.0 / err[mask]))
        self.err_tot = float(np.sqrt(1.0 / np.sum(1.0 / err[mask])))
        self._integ_hist = integ
        self._err_hist = err

        if run is not None and integrate:
            run.log_scalar("training.integ", self.integ_tot, 0)
            run.log_scalar("training.err", self.err_tot, 0)

        if log and logdir is not None:
            self._save_checkpoint(logdir)

        if integrate:
            return (self.integ_tot, self.err_tot)
        return (0, 0)

    # -- post-training integrator (reference manager.py:380-405) ------------

    def integrate(self, f, nitn, neval, dev=None, seed=None):
        if self.best_params is None:
            print("No model has been trained")
            return (0, 0)
        del dev
        neval = int(neval)
        nitn = int(nitn)
        key = jax.random.PRNGKey(seed) if seed is not None else self._next_key()
        params, bn_state = self.best_params
        flow = self._flow
        train_mode = not self.best_eval_mode  # reference never calls .eval()
        n_flow, dtype = self.n_flow, self.dtype

        @jax.jit
        def run_all(key):
            def itn(_, k):
                w = self._shard_batch(_uniform(k, (neval, n_flow), dtype))
                x, jacv, _ = fmodel.forward(flow, params, bn_state, w, train_mode)
                fres = f(x) * jacv
                return None, (jnp.mean(fres), _var(fres))
            keys = jax.random.split(key, nitn)
            _, (means, variances) = jax.lax.scan(itn, None, keys)
            sig = jnp.sum(means / variances) / jnp.sum(1.0 / variances)
            sig_err = jnp.sqrt(1.0 / jnp.sum(1.0 / variances)) / math.sqrt(neval * nitn)
            return sig, sig_err

        sig, sig_err = run_all(key)
        return (float(sig), float(sig_err))

    # -- checkpointing (improves on the reference's save-only torch.save,
    #    manager.py:358-369) --------------------------------------------------

    def _save_checkpoint(self, logdir):
        from nf_tpu.utils import checkpoint as ckpt
        import os
        try:
            os.makedirs(logdir, exist_ok=True)
            ckpt.save(os.path.join(logdir, "checkpoint.msgpack"), {
                "params": self.best_params[0],
                "bn_state": self.best_params[1],
                "meta": {
                    "best_epoch": getattr(self, "best_epoch", 0),
                    "best_loss": float(self.best_loss),
                    "int_loss": float(self.int_loss),
                    "best_loss_rel": float(getattr(self, "best_loss_rel", 1.0)),
                    "best_func_count": float(getattr(self, "best_func_count", 0)),
                    "integ": float(getattr(self, "integ_tot", 0.0)),
                    "err": float(getattr(self, "err_tot", 0.0)),
                },
            })
        except Exception as e:  # pragma: no cover - mirrors reference guard
            print(f"Checkpoint save not possible: {e}")

    def load_checkpoint(self, path):
        """Restore best params (the reference has no restore at all)."""
        from nf_tpu.utils import checkpoint as ckpt
        data = ckpt.load(path, {
            "params": self._params, "bn_state": self._bn_state, "meta": None})
        self.best_params = (data["params"], data["bn_state"])
        self._params = data["params"]
        self._bn_state = data["bn_state"]
        return data.get("meta")

    # -- warm-up forward (reference manager.py:592-598) ----------------------

    def _warmup(self, n=5):
        w = _uniform(self._next_key(), (n, self.n_flow), self.dtype)
        _, _, self._bn_state = fmodel.forward(
            self._flow, self._params, self._bn_state, w, True)


class AffineManager(BasicManager):
    """Affine coupling cells + roll layers (reference manager.py:411-453)."""

    def create_model(self, n_pass_through, n_cells, NN, roll_step, dev=None):
        del dev
        self._flow, self._params, self._bn_state = factory.build_affine_flow(
            self._next_key(), self.n_flow, n_pass_through, n_cells,
            tuple(NN), roll_step, self.dtype)
        self.best_params = (self._params, self._bn_state)
        self._warmup(10)


class PWLinManager(BasicManager):
    """Piecewise-linear coupling cells + roll layers (reference manager.py:456-499)."""

    def create_model(self, n_pass_through, n_cells, n_bins, NN, roll_step, dev=None):
        del dev
        self._flow, self._params, self._bn_state = factory.build_pwlin_flow(
            self._next_key(), self.n_flow, n_pass_through, n_cells, n_bins,
            tuple(NN), roll_step, self.dtype)
        self.best_params = (self._params, self._bn_state)
        self._warmup(5)


class PWQuadManager(BasicManager):
    """Piecewise-quadratic cells; masked partition for n_flow > 7
    (reference manager.py:502-600)."""

    def create_model(self, n_cells, n_bins, NN, dev=None):
        del dev
        self._flow, self._params, self._bn_state = factory.build_pwquad_flow(
            self._next_key(), self.n_flow, n_cells, n_bins, tuple(NN), self.dtype)
        self.best_params = (self._params, self._bn_state)
        self._warmup(5)
