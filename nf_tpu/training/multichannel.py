"""Learned multi-channel importance sampling: one flow PER channel.

The fixed-alpha combination (phasespace.topology.multichannel_integrand)
feeds ONE flow a selector column + a shared latent block — but the same
latent columns mean different things in different channels, so a single
smooth map cannot specialize per channel.  This module implements the
modern answer (MadNIS-style; Heimel et al., arXiv 2311.01548 — technique
reference only): each channel k gets its own normalizing flow g_k on its
own latent cube, and samples are combined with the full LEARNED mixture
density

    q(x) = sum_m alpha_m  rho_m(u_m(x)) / w_m^PS(x) / C(x)

where rho_m is flow m's latent density (flows.model.inverse: the exact
inverse-Jacobian), u_m(x) the channel-m latent coordinates of the point
(ResonanceDecayPhasespace.invertKinematics_batch — closed-form), w_m^PS
the closed-form channel phase-space density, and C(x) the channel-
independent PDF * cuts / flux factor.  Every sample carries weight
f(x)/q(x), which is exactly unbiased for ANY positive alphas and ANY
flow parameters — optimization only moves variance.

Training (one jit, lax.scan over epochs — fixed shapes, no host round
trips):

  * samples are drawn stratified (equal per-channel batches, weighted by
    alpha — fixed shapes on TPU; the estimator is the alpha-weighted sum
    of per-channel means);
  * the flows train on the stratified variance (or second-moment) of the
    mixture weights with the sample detached (the reference's fixed-
    sample scheme, reference manager.py:234) — gradients flow through
    the C^2 density evaluations rho_m(u_m(x_k));
  * alphas optionally follow the on-device Kleiss-Pittau update from the
    same samples (topology.optimize_alphas is the host/fixed-map
    variant);
  * the best (params, alphas) snapshot is tracked by mixture ESS.

The reference has no multi-channel machinery at all (single flat RAMBO
channel, reference nisrep/PhaseSpace/flat_phase_space_generator.py); this
module plus the tree channels is what makes competing-resonance targets
(e.g. same-flavor ZZ/Z' -> 4l) learnable — measured in
examples/zz_multichannel.py.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from nf_tpu.flows import factory as fl_factory
from nf_tpu.flows import model as fmodel

_EPS_U = 1e-9

# Salt for deriving the compaction-permutation key from a batch key
# (jax.random.fold_in) so the batch's own stream is untouched — the
# compacted path draws bit-identical proposals to the uncompacted one.
_PERM_SALT = 0x5EED


def _compact_rows(mom, xb, v, accept, capacity, perm_key):
    """Gather <= ``capacity`` accepted rows into ONE packed array.

    Returns ``(payload [capacity, P*4 + xb_dim + 1], kept)`` with rows
    ``[momenta.flat | xb | v]``; the host slices ``[:kept]``.  Packing
    everything into a single array matters on a tunnel-attached TPU:
    each separate device->host array pays a fixed ~24 ms round-trip
    (measured, tools/probe_unweight_cost.py), so one payload + one small
    stats vector beats four loose arrays even before the 1/accept-rate
    bandwidth saving.

    The accepted rows here are NOT exchangeable across the flattened
    axis (strata are channel-ordered), so "keep the first ``capacity``"
    would bias toward low channel indices on overflow.  A uniform random
    permutation is applied first: the kept subset is then a uniform
    random subset of the accepted rows, which leaves the kept sample
    exactly f-distributed under any overflow.  Without overflow the kept
    SET equals the uncompacted accepted set (order differs).
    """
    n = v.shape[0]
    perm = jax.random.permutation(perm_key, n)
    idx = perm[jnp.nonzero(accept[perm], size=capacity, fill_value=0)[0]]
    payload = jnp.concatenate(
        [mom.reshape(n, -1)[idx], xb.reshape(n, -1)[idx], v[idx][:, None]],
        axis=1)
    return payload, jnp.minimum(jnp.sum(accept), capacity)


def _unpack_rows(rows, xb_dim=2):
    """Host-side inverse of :func:`_compact_rows` row packing."""
    n_particles = (rows.shape[1] - xb_dim - 1) // 4
    mom = rows[:, :n_particles * 4].reshape(-1, n_particles, 4)
    return mom, rows[:, n_particles * 4:-1], rows[:, -1]


_EXEC_CACHE = None


def _cached_jit(shape_key, build, anchors):
    """Reuse jitted unweighting executables ACROSS calls.

    jax.jit caches per function OBJECT; the unweighting steps are closures
    rebuilt on every ``multichannel_unweight`` call, and on the
    remote-compile backend the persistent XLA cache does not apply — so
    without this, every call recompiles programs that are byte-identical
    across calls (measured: 60-100 s per compile vs 13.8 ms/batch
    execution, tools/probe_unweight_cost2.py).  The key combines the
    static shape/config tuple with the identity of every closed-over
    object; entries hold strong identity-verified references to params /
    states LEAVES (jax arrays are immutable, and a functional params
    update replaces leaves, so leaf identity is exactly "same compiled
    constants"), channels, flows, and the matrix element — the same
    FIFO-bounded scheme as manager._SamplerCache.  Everything that varies
    between calls with the same model (w_max, thinning, alphas, keys)
    enters the programs as traced operands instead.
    """
    global _EXEC_CACHE
    if _EXEC_CACHE is None:
        from nf_tpu.training.manager import _SamplerCache
        _EXEC_CACHE = _SamplerCache(maxsize=32)
    key = shape_key + tuple(id(a) for a in anchors)
    fn = _EXEC_CACHE.get(key, anchors)
    if fn is None:
        fn = build()
        _EXEC_CACHE.put(key, fn, anchors)
    return fn


def _exec_anchors(channels, flows, params, states, matrix_element):
    return (tuple(jax.tree_util.tree_leaves((params, states)))
            + (matrix_element,) + tuple(channels) + tuple(flows))


def _size_capacity(rate, n, floor=1024):
    """Gather capacity from an accept-rate estimate with 1.5x headroom,
    rounded UP to a power of two: capacity is a compiled shape, and the
    remote-compile service charges ~60-1000 s per new program — bucketing
    trades <=2x extra transfer rows (cheap) for shape reuse across
    quantiles/runs (and across processes via the persistent XLA cache)."""
    want = max(floor, int(1.5 * rate * n) + 16)
    return int(min(n, 1 << (want - 1).bit_length()))


def build_channel_flows(key, channels, n_cells, n_bins, nn_layers,
                        dtype=None, final_rank=None, activation="exp"):
    """One identity-initialized PWQuad flow per channel.

    Identity init is essential here: each flow starts as the exact
    identity so the mixture starts AT the analytic channel maps' quality
    (factory.identity_init) instead of destroying it.  Returns
    ``(flows, params_tuple, states_tuple)``.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    n_lat = channels[0].nDimPhaseSpace() \
        + (2 if channels[0].pdf_active else 0)
    flows, ps, ss = [], [], []
    for k in range(len(channels)):
        fkey = jax.random.fold_in(key, k)
        flow, p, s = fl_factory.build_pwquad_flow(
            fkey, n_lat, n_cells, n_bins, nn_layers, dtype,
            final_rank=final_rank, activation=activation)
        p = fl_factory.identity_init(p)
        flows.append(flow)
        ps.append(p)
        ss.append(s)
    return tuple(flows), tuple(ps), tuple(ss)


def _shard_batch(z, mesh):
    """Constrain the batch axis onto the mesh's 'dp' axis (GSPMD shards
    everything downstream; reductions become psums — same pattern as
    ``BasicManager._shard_batch``)."""
    if mesh is None:
        return z
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(z, NamedSharding(mesh, P("dp")))


def mixture_weights(channels, flows, params, states, matrix_element, E_cm,
                    key, batch_per_channel, alphas, pT_mincut=-1,
                    delR_mincut=-1, rap_maxcut=-1, pdgs=(0, 0), dtype=None,
                    with_kinematics=False, mesh=None, only_channel=None):
    """Draw stratified samples and return mixture weights + density info.

    Returns ``(w [C, B], aux)`` where ``w[k]`` are the weights of channel
    k's samples (the unbiased integral estimate is
    ``sum_k alphas[k] * mean(w[k])``) and ``aux['r'] [C, C, B]`` holds the
    per-sample density fractions ``r[m, k] = (rho_m/ps_m) / q_hat`` the
    Kleiss-Pittau alpha update consumes; ``aux['q'] [C, B]`` is the full
    learned mixture density q_hat at each sample (gradients attached —
    the KL loss differentiates through it).  Samples are DETACHED;
    gradients flow only through the flow densities (fixed-sample
    scheme).

    ``mesh`` shards each channel's batch over the mesh's 'dp' axis
    (bit-identical results — the PRNG stream does not depend on the
    sharding; only the device placement changes).

    ``only_channel`` (static int) restricts the SOURCE of samples to one
    channel: ``w``/``aux`` then have a leading source axis of length 1
    (densities are still evaluated through every channel — q_hat is the
    full mixture).  Used by the per-channel-max unweighter, which needs
    unequal proposal counts per channel.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    C = len(channels)
    n_lat = channels[0].nDimPhaseSpace() \
        + (2 if channels[0].pdf_active else 0)
    alphas = jnp.asarray(alphas, dtype)

    sources = enumerate(channels) if only_channel is None \
        else [(only_channel, channels[only_channel])]
    ws, qs, rs, fs, moms, xbs = [], [], [], [], [], []
    for k, ch in sources:
        z = _shard_batch(
            jax.random.uniform(jax.random.fold_in(key, k),
                               (batch_per_channel, n_lat), dtype), mesh)
        u_k, _, _ = fmodel.forward(flows[k], params[k], states[k], z, False)
        u_k = jax.lax.stop_gradient(
            jnp.clip(u_k, _EPS_U, 1.0 - _EPS_U))
        x, w_full = ch.generateKinematics_batch(
            E_cm, u_k, pT_mincut=pT_mincut, delR_mincut=delR_mincut,
            rap_maxcut=rap_maxcut, pdgs=pdgs)
        x = jax.lax.stop_gradient(x)
        w_full = jax.lax.stop_gradient(w_full)
        if ch.pdf_active:
            _, _, xb1, xb2, _ = ch._convolve_pdf(E_cm, u_k, pdgs)
            xb1 = jax.lax.stop_gradient(xb1)
            xb2 = jax.lax.stop_gradient(xb2)
        else:
            xb1 = xb2 = None

        dens = []
        ps_k = None
        for m, chm in enumerate(channels):
            ps_m = chm.channel_weight_ps(x)
            if m == k:
                ps_k = ps_m
                u_m = u_k
                ok_m = ps_m > 0
            else:
                u_m = chm.invertKinematics_batch(E_cm, x, xb1, xb2)
                # in-support test: ps_m > 0 AND the inverse landed inside
                # the open cube (clip endpoints mark unreachable points)
                ok_m = (ps_m > 0) & jnp.all((u_m > 0.0) & (u_m < 1.0),
                                            axis=1)
            u_m = jax.lax.stop_gradient(
                jnp.clip(jnp.where(ok_m[:, None], u_m, 0.5),
                         _EPS_U, 1.0 - _EPS_U))
            _, rho_m, _ = fmodel.inverse(flows[m], params[m], states[m],
                                         u_m, False)
            dens.append(jnp.where(ok_m,
                                  rho_m / jnp.where(ok_m, ps_m, 1.0), 0.0))
        dens = jnp.stack(dens, axis=0)                        # [C, B]
        q_hat = jnp.sum(alphas[:, None] * dens, axis=0)
        # C(x) = w_full / ps_k  (PDF * cuts / flux; zero for cut events)
        ok = (ps_k > 0) & (q_hat > 0) & (w_full != 0)
        cfac = jnp.where(ok, w_full / jnp.where(ps_k > 0, ps_k, 1.0), 0.0)
        fval = jax.lax.stop_gradient(matrix_element(x))
        w = jnp.where(ok, fval * cfac / jnp.where(ok, q_hat, 1.0), 0.0)
        ws.append(w)
        qs.append(q_hat)
        rs.append(jnp.where(q_hat[None, :] > 0,
                            dens / jnp.where(q_hat[None, :] > 0,
                                             q_hat[None, :], 1.0), 0.0))
        fs.append(fval)
        if with_kinematics:
            moms.append(x)
            xbs.append(jnp.stack(
                [xb1, xb2], axis=-1) if ch.pdf_active else
                jnp.ones((batch_per_channel, 2), dtype))
    aux = {"r": jnp.stack(rs, axis=1), "f": jnp.stack(fs, axis=0),
           "q": jnp.stack(qs, axis=0)}
    if with_kinematics:
        aux["momenta"] = jnp.stack(moms, axis=0)       # [C, B, P, 4]
        aux["xb"] = jnp.stack(xbs, axis=0)             # [C, B, 2]
    return jnp.stack(ws, axis=0), aux


def train_multichannel(channels, flows, params, states, matrix_element,
                       E_cm, optimizer, key, alphas=None,
                       batch_per_channel=4096, epochs=100, loss_mode="var",
                       learn_alphas=True, alpha_damping=0.5,
                       alpha_floor=1e-2, pT_mincut=-1, delR_mincut=-1,
                       rap_maxcut=-1, pdgs=(0, 0), dtype=None, mesh=None,
                       mini_batch_per_channel=None, epochs_per_call=None,
                       save_state=None, resume_from=None,
                       stop_after_chunks=None):
    """Train per-channel flows (+ Kleiss-Pittau alphas) in ONE jit.

    ``optimizer`` is an optax transformation applied to the tuple of all
    channels' params jointly.  ``loss_mode``: ``"var"`` (stratified
    within-channel variances, alpha-weighted — the multi-channel analogue
    of the reference's variance loss), ``"secmom"`` (alpha-weighted
    second moment, the MadNIS objective), or ``"kl"`` (reweighted
    forward KL on the learned mixture density — mass-covering).  On the
    ZZ/Z' competing-pairings target ``"kl"`` is the measured winner by
    an order of magnitude: 28.9% best ESS vs 2.0% (var) / 2.3% (secmom),
    which plateau regardless of lr/alphas (tools/tune_multichannel.py,
    TPU v5e, 300 epochs x 131k/channel).  ``"var"`` stays the default as
    the reference-analogue objective; use ``"kl"`` for narrow
    multi-resonance targets.  When ``learn_alphas`` the
    Kleiss-Pittau update runs on-device once per epoch with exponent
    ``alpha_damping/2`` and floor ``alpha_floor`` (the estimator is
    unbiased at every iterate, so moving alphas never biases the
    integral).  ``mesh`` data-parallelizes every epoch over the mesh's
    'dp' axis (per-channel batches sharded; gradients/means psum'd by
    GSPMD) — results are bit-identical to the single-device run.

    ``mini_batch_per_channel`` bounds the backward-pass activation
    memory (the manager's ``mini_batch_size`` analogue): each epoch
    scans ``batch_per_channel / mini_batch_per_channel`` minibatches,
    averaging gradients and accumulating the epoch's weight statistics
    (integral / ESS / Kleiss-Pittau sums stay full-epoch estimates);
    one optimizer step per epoch.  Defaults to ``batch_per_channel``
    (single minibatch — identical to the unbatched path).

    ``epochs_per_call`` splits the epoch scan across several device
    dispatches (ONE compiled program reused; the epoch-key stream and
    every statistic are identical to the single-dispatch run).  Use it
    to bound per-dispatch device-program size on runtimes that fault on
    very large programs (the remote-runtime fault register in
    training/ensemble.py) and to regain between-dispatch progress
    visibility on long runs.

    ``save_state`` (path) checkpoints the full training carry — params,
    optimizer state, alphas, the best-ESS snapshot, and the history —
    after every completed chunk (so pair it with ``epochs_per_call`` to
    set the checkpoint cadence).  ``resume_from`` (path) restores it and
    continues from the next chunk; the epoch-key stream is re-derived
    from the caller's ``key``, so a resumed run reproduces the
    uninterrupted run exactly (chunk-boundary-exact, the multi-channel
    analogue of the manager's ``save_training_state``/``resume_from``).
    The caller must pass the same channels/flows/config and key;
    epochs / epochs_per_call are validated against the checkpoint.
    ``stop_after_chunks`` returns after that many chunks THIS call
    (history covers only the epochs run so far) — with ``save_state``
    it splits one long schedule across sessions/budget windows.

    Returns a dict: ``params``/``alphas`` (final), ``best_params``/
    ``best_alphas`` (highest mixture ESS), ``best_ess``, and per-epoch
    ``history`` arrays (loss, integral, ess, alphas).
    """
    if loss_mode not in ("var", "secmom", "kl"):
        raise ValueError(f"loss_mode={loss_mode!r} not in "
                         "('var', 'secmom', 'kl')")
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    C = len(channels)
    if alphas is None:
        alphas = np.full((C,), 1.0 / C)
    alphas0 = jnp.asarray(np.asarray(alphas, np.float64) /
                          np.sum(alphas), dtype)
    opt_state = optimizer.init(tuple(params))

    kw = dict(pT_mincut=pT_mincut, delR_mincut=delR_mincut,
              rap_maxcut=rap_maxcut, pdgs=pdgs, dtype=dtype, mesh=mesh)

    if mini_batch_per_channel is None:
        mini_batch_per_channel = batch_per_channel
    if batch_per_channel % mini_batch_per_channel != 0:
        raise ValueError(
            f"mini_batch_per_channel={mini_batch_per_channel} must divide "
            f"batch_per_channel={batch_per_channel}")
    n_mb = batch_per_channel // mini_batch_per_channel
    mb = mini_batch_per_channel

    # weight scale (the manager's maxf analogue): one detached pass at the
    # initial parameters keeps the loss O(1)
    w0, _ = jax.jit(lambda p, a, k: mixture_weights(
        channels, flows, p, states, matrix_element, E_cm, k,
        mb, a, **kw))(tuple(params), alphas0,
                      jax.random.fold_in(key, 0xA11CE))
    w_scale = jnp.maximum(jnp.max(jax.lax.stop_gradient(w0)), 1e-300)

    def epoch_step(carry, ek):
        params, opt_state, alphas, best = carry

        def mb_step(acc, mkey):
            def loss_fn(p):
                w, aux = mixture_weights(channels, flows, p, states,
                                         matrix_element, E_cm, mkey,
                                         mb, alphas, **kw)
                wn = w / w_scale
                m1 = jnp.mean(wn, axis=1)
                m2 = jnp.mean(wn ** 2, axis=1)
                if loss_mode == "var":
                    loss = jnp.sum(alphas * (m2 - m1 ** 2))
                elif loss_mode == "kl":
                    # reweighted forward KL on the learned mixture density
                    # (the manager's kl extension generalized to channels):
                    # minimize -E[w_tilde log q_hat] with w_tilde detached.
                    # Mass-covering; gradients flow through every rho_m in
                    # q_hat.  Zero-weight (cut / out-of-support) samples
                    # contribute exactly 0 (w is 0 there and log is
                    # guarded).
                    logq = jnp.log(jnp.maximum(aux["q"], 1e-300))
                    loss = -jnp.sum(alphas * jnp.mean(
                        jax.lax.stop_gradient(wn) * logq, axis=1))
                else:
                    loss = jnp.sum(alphas * m2)
                return loss, (w, aux)

            (loss, (w, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tuple(params))
            g_acc, l_acc, s1, s2, sW = acc
            g_acc = jax.tree.map(lambda a, b: a + b, g_acc, grads)
            s1 = s1 + jnp.sum(w, axis=1)
            s2 = s2 + jnp.sum(w ** 2, axis=1)
            # Kleiss-Pittau numerator sums: W_m = E[(f/q)^2 p_m],
            # estimated stratified — accumulated across minibatches
            sW = sW + jnp.sum(alphas[None, :, None] * w[None, :, :] ** 2
                              * aux["r"], axis=(1, 2))
            return (g_acc, l_acc + loss, s1, s2, sW), None

        zeros_c = jnp.zeros((C,), dtype)
        acc0 = (jax.tree.map(jnp.zeros_like, tuple(params)),
                jnp.zeros((), dtype), zeros_c, zeros_c, zeros_c)
        (grads, loss, s1, s2, sW), _ = jax.lax.scan(
            mb_step, acc0, jax.random.split(ek, n_mb))
        grads = jax.tree.map(lambda g: g / n_mb, grads)
        loss = loss / n_mb
        updates, opt_state = optimizer.update(grads, opt_state,
                                              tuple(params))
        params = jax.tree.map(lambda a, u: a + u, tuple(params), updates)

        m1 = jnp.sum(alphas * s1) / batch_per_channel
        m2 = jnp.sum(alphas * s2) / batch_per_channel
        ess = m1 ** 2 / jnp.maximum(m2, 1e-300)
        integral = m1

        improved = ess > best[0]
        best = (jnp.where(improved, ess, best[0]),
                jax.tree.map(lambda old, new: jnp.where(improved, new, old),
                             best[1], params),
                jnp.where(improved, alphas, best[2]))

        if learn_alphas:
            W = sW / batch_per_channel
            new = alphas * jnp.power(jnp.maximum(W / jnp.maximum(
                jnp.max(W), 1e-300), 1e-12), alpha_damping / 2.0)
            new = new / jnp.sum(new)
            new = jnp.maximum(new, alpha_floor)
            alphas = new / jnp.sum(new)

        return (params, opt_state, alphas, best), \
            (loss, integral, ess, alphas)

    if epochs_per_call is None:
        epochs_per_call = epochs
    if epochs % epochs_per_call != 0:
        raise ValueError(
            f"epochs_per_call={epochs_per_call} must divide "
            f"epochs={epochs}")
    n_calls = epochs // epochs_per_call

    best0 = (jnp.asarray(-1.0, dtype), tuple(params), alphas0)
    keys = jax.random.split(key, epochs)

    @jax.jit
    def run(params, opt_state, alphas, best, chunk_keys):
        return jax.lax.scan(epoch_step, (params, opt_state, alphas, best),
                            chunk_keys)

    carry = (tuple(params), opt_state, alphas0, best0)
    hists = []
    c_start = 0

    def _hist_concat():
        if not hists:
            z = np.zeros(0, np.asarray(jax.device_get(alphas0)).dtype)
            return {"loss": z, "integral": z.copy(), "ess": z.copy(),
                    "alphas": np.zeros((0, C), z.dtype)}
        blocks = [np.concatenate([np.asarray(jax.device_get(h[j]))
                                  for h in hists]) for j in range(4)]
        return {"loss": blocks[0], "integral": blocks[1],
                "ess": blocks[2], "alphas": blocks[3]}

    if resume_from is not None:
        from nf_tpu.utils import checkpoint as _ckpt
        template = {"c": np.zeros((), np.int64),
                    "config": np.zeros(2, np.int64),
                    "carry": carry, "hist": _hist_concat()}
        payload = _ckpt.load(resume_from, template)
        if tuple(np.asarray(payload["config"]).tolist()) != \
                (epochs, epochs_per_call):
            raise ValueError(
                "checkpoint was written with epochs/epochs_per_call = "
                f"{tuple(np.asarray(payload['config']).tolist())}, "
                f"resume called with ({epochs}, {epochs_per_call})")
        carry = payload["carry"]
        c_start = int(payload["c"])
        hists = [tuple(payload["hist"][k]
                       for k in ("loss", "integral", "ess", "alphas"))]

    for c in range(c_start, n_calls):
        carry, hist = run(*carry,
                          keys[c * epochs_per_call:(c + 1) * epochs_per_call])
        hists.append(hist)
        if save_state is not None:
            from nf_tpu.utils import checkpoint as _ckpt
            _ckpt.save(save_state, {
                "c": np.asarray(c + 1, np.int64),
                "config": np.asarray([epochs, epochs_per_call], np.int64),
                "carry": jax.device_get(carry),
                "hist": _hist_concat()})
        if stop_after_chunks is not None and \
                c + 1 - c_start >= stop_after_chunks:
            break
    params, opt_state, alphas, best = carry
    losses, integrals, esses, alpha_hist = (
        jnp.concatenate([h[j] for h in hists]) for j in range(4))
    return {
        "params": params,
        "alphas": np.asarray(alphas),
        "best_params": best[1],
        "best_alphas": np.asarray(best[2]),
        "best_ess": float(best[0]),
        "history": {
            "loss": np.asarray(losses),
            "integral": np.asarray(integrals),
            "ess": np.asarray(esses),
            "alphas": np.asarray(alpha_hist),
        },
    }


def multichannel_sample(channels, flows, params, states, matrix_element,
                        E_cm, key, n_per_channel, alphas, **kw):
    """Eval-mode stratified sample: returns ``(weights [C, B], aux)`` from
    :func:`mixture_weights` at fixed parameters — the production surface
    for integration (:func:`combine_stratified`) and unweighting (accept
    with probability w / w_max within each channel, weighted
    cross-channel by alpha)."""
    return mixture_weights(channels, flows, params, states, matrix_element,
                           E_cm, key, n_per_channel, alphas, **kw)


def multichannel_unweight(channels, flows, params, states, matrix_element,
                          E_cm, key, alphas, n_events,
                          batch_per_channel=1 << 15, w_max=None,
                          wmax_quantile=1.0, max_batches=1000,
                          per_channel_max=False, partial_unweight=False,
                          compact=True, batches_per_call=8,
                          **kw):
    """Unweighted event generation from the learned mixture (host loop).

    Strata are equal-size (fixed shapes), so channel k's proposals are
    accepted with probability ``C * alpha_k * w / w_max`` — the accepted
    density is then exactly proportional to f(x) (the alpha factor
    re-weights the equal strata to the alpha-mixture).  ``w_max`` bounds
    ``C * alpha_k * w``; estimated from one batch when absent
    (``wmax_quantile < 1`` uses that quantile; over-weight events are
    accepted unconditionally and counted, standard practice — see
    training/unweight.py for the single-flow analogue).

    ``partial_unweight=True`` switches to PARTIAL unweighting (the
    MadGraph/MadNIS overweight treatment): acceptance is unchanged, but
    every accepted event carries the weight ``max(1, v/w_max)`` — the
    weighted accepted sample is then EXACTLY f-distributed at ANY
    ``wmax_quantile`` (the plain mode's overweight truncation bias
    disappears; only the weight spread changes).  The return becomes
    ``(events, xb, weights, info)`` with ``info = {"eff", "accept_rate",
    "n_overweight", "w_max"}``; ``eff`` is the Kish effective efficiency
    ``(sum w)^2 / sum w^2 / n_proposals``, which interpolates from the
    standard unweighting efficiency (quantile 1) up toward the mixture
    ESS fraction as the quantile drops — lowering the quantile buys
    effective events at the price of a heavier carried-weight tail.
    Composes with ``per_channel_max`` (carried weight
    ``max(1, w/w_max_k)``; scheduling then switches from i.i.d. batches
    to thinned all-channel rounds — see :func:`_unweight_per_channel_max`
    — because partial mode's high acceptance leaves too few batches for
    the i.i.d. schedule's per-batch channel granularity).

    ``per_channel_max=True`` switches to per-channel maxima (the
    MadGraph-style multi-channel unweighting the reference lacks; the
    reference has no unweighting OR channels at all): channel k's
    proposals accept with probability ``w / w_max_k`` and each batch's
    source channel is drawn i.i.d. with probability
    ``∝ alpha_k * w_max_k`` (i.i.d. scheduling keeps the accepted sample
    exactly f-distributed under any stopping rule — see
    :func:`_unweight_per_channel_max`).  The accepted density from channel k
    is then ``∝ alpha_k w_max_k · q_k(x) · w(x)/w_max_k
    = alpha_k q_k(x) f(x)/q_hat(x)``, which sums over channels to
    exactly f(x) — unbiased regardless of any per-channel cross-section
    estimate, and efficiency ``sigma / sum_k alpha_k w_max_k``.  Note
    the global scheme is itself the special allocation
    ``w_max_k = w_max / (C alpha_k)`` (equalized contributions), so the
    win comes from choosing BETTER thresholds: with true maxima
    (``wmax_quantile=1``) per-channel bounds are never worse; with a
    truncation quantile the pilot's overweight budget is allocated
    across channels by a greedy knapsack that minimizes
    ``sum_k alpha_k w_max_k`` (measured to beat both the naive
    per-channel quantile AND the global scheme — see
    docs/PERFORMANCE.md).

    ``compact=True`` (default) performs the accept-reject and row
    gathering ON DEVICE and transfers one packed payload of accepted
    rows per dispatch — with ``batches_per_call`` proposal batches
    chained in a single ``lax.map`` dispatch — instead of pulling every
    proposal's momenta to host each batch.  Measured on the
    tunnel-attached v5e (tools/probe_unweight_cost.py): the uncompacted
    loop pays ~430 ms/batch against a 36 ms device floor (fixed ~24 ms
    per transferred array + ~24 MB/s effective bandwidth), so compaction
    + chaining is the difference between ~1k and ~10k events/s.
    Statistically exact: the compacted accepted SET equals the
    uncompacted one (order permuted) unless a batch's accepts overflow
    the auto-sized capacity, in which case a uniform random subset is
    kept (exchangeable-safe — see :func:`_compact_rows`) and the
    capacity doubles.  ``compact=False`` keeps the reference host loop;
    ``batches_per_call=1`` keeps per-batch dispatch granularity (the
    proposal key sequence is identical in all modes).

    Returns ``(events [>= n_events, n_particles, 4] COM momenta,
    xb [n, 2], efficiency, n_overweight)``.
    """
    if per_channel_max:
        return _unweight_per_channel_max(
            channels, flows, params, states, matrix_element, E_cm, key,
            alphas, n_events, batch_per_channel, w_max, wmax_quantile,
            max_batches, partial_unweight=partial_unweight,
            compact=compact, rounds_per_call=batches_per_call, **kw)
    C = len(channels)
    alphas = jnp.asarray(alphas)
    anchors = _exec_anchors(channels, flows, params, states, matrix_element)
    skey = ("mcu", C, batch_per_channel, E_cm, tuple(sorted(kw.items())))

    def batch_fn(k, al):
        k_w, k_u = jax.random.split(k)
        w, aux = mixture_weights(channels, flows, params, states,
                                 matrix_element, E_cm, k_w,
                                 batch_per_channel, al,
                                 with_kinematics=True, **kw)
        v = C * al[:, None] * w
        u = jax.random.uniform(k_u, v.shape, dtype=v.dtype)
        return v, u, aux["momenta"], aux["xb"]

    batch_jit = _cached_jit(skey + ("batch",),
                            lambda: jax.jit(batch_fn), anchors)

    est_rate = None
    if w_max is None:
        key, sub = jax.random.split(key)
        v, _, _, _ = batch_jit(sub, alphas)
        ref = jnp.max(v) if wmax_quantile >= 1.0 \
            else jnp.quantile(v, wmax_quantile)
        w_max = float(ref) * 1.05
        # max() guards the fully-cut pilot (w_max == 0): accept rate 0,
        # not NaN, so capacity sizing stays finite
        est_rate = float(jnp.mean(jnp.minimum(
            1.0, v / max(w_max, 1e-300))))

    CB = C * batch_per_channel
    out_ev, out_xb, out_w = [], [], []
    n_acc, n_prop, n_over, v_sum = 0, 0, 0, 0.0

    def host_batch(sub):
        nonlocal n_acc, n_prop, n_over, v_sum
        v, u, mom, xb = batch_jit(sub, alphas)
        acc = np.asarray(u * w_max < v).reshape(-1)
        out_ev.append(np.asarray(mom).reshape(-1, mom.shape[2], 4)[acc])
        out_xb.append(np.asarray(xb).reshape(-1, 2)[acc])
        if partial_unweight:
            out_w.append(np.maximum(
                1.0, np.asarray(v).reshape(-1)[acc] / w_max))
        n_acc += int(acc.sum())
        n_prop += acc.size
        n_over += int(np.asarray(jnp.sum(v > w_max)))
        v_sum += float(jnp.sum(v))
        return float(acc.mean())

    def make_cstep(capacity):
        # w_max / alphas enter as traced OPERANDS, not closure constants:
        # they change per call (pilot-dependent), and a baked-in constant
        # would make every call a brand-new program — a 60-1000 s remote
        # compile each time, which is exactly what the device-side
        # compaction is meant to amortize away.  The jit object itself is
        # reused across calls via _cached_jit for the same reason.
        def one(sub, wm, al):
            v, u, mom, xb = batch_fn(sub, al)
            vf, uf = v.reshape(-1), u.reshape(-1)
            acc = uf * wm < vf
            payload, kept = _compact_rows(
                mom.reshape(CB, -1, 4), xb.reshape(CB, -1), vf, acc,
                capacity, jax.random.fold_in(sub, _PERM_SALT))
            stats = jnp.stack([kept.astype(vf.dtype),
                               jnp.sum(acc).astype(vf.dtype),
                               jnp.sum(vf > wm).astype(vf.dtype),
                               jnp.sum(vf)])
            return payload, stats
        return _cached_jit(
            skey + ("cstep", capacity),
            lambda: jax.jit(lambda subs, wm, al: jax.lax.map(
                lambda s: one(s, wm, al), subs)),
            anchors)

    if not compact:
        for _ in range(max_batches):
            key, sub = jax.random.split(key)
            host_batch(sub)
            if n_acc >= n_events:
                break
    else:
        k_call = max(int(batches_per_call), 1)
        n_batches, capacity, cstep = 0, None, None
        if est_rate is not None:
            capacity = _size_capacity(est_rate, CB)
        while n_batches < max_batches and n_acc < n_events:
            if capacity is None:  # w_max was given: size from one batch
                key, sub = jax.random.split(key)
                rate = host_batch(sub)
                n_batches += 1
                capacity = _size_capacity(max(rate, 1.0 / CB), CB)
                continue
            if cstep is None:
                cstep = make_cstep(capacity)
            subs = []
            for _ in range(k_call):
                key, sub = jax.random.split(key)
                subs.append(sub)
            payloads, stats = cstep(jnp.stack(subs), jnp.asarray(w_max),
                                    alphas)
            payloads, stats = np.asarray(payloads), np.asarray(stats)
            grew = False
            for i in range(k_call):
                kept, n_true = int(stats[i, 0]), int(stats[i, 1])
                mom_i, xb_i, v_i = _unpack_rows(payloads[i, :kept])
                out_ev.append(mom_i)
                out_xb.append(xb_i)
                if partial_unweight:
                    out_w.append(np.maximum(1.0, v_i / w_max))
                n_acc += kept
                n_prop += CB
                n_batches += 1
                n_over += int(stats[i, 2])
                v_sum += float(stats[i, 3])
                grew |= n_true > capacity
            if grew and capacity < CB:
                capacity = min(2 * capacity, CB)
                cstep = None
    events = np.concatenate(out_ev, axis=0)
    xbs = np.concatenate(out_xb, axis=0)
    if partial_unweight:
        wts = np.concatenate(out_w, axis=0)
        kish = float(wts.sum()) ** 2 / max(float((wts ** 2).sum()), 1e-300)
        info = {"eff": kish / max(n_prop, 1),
                "accept_rate": n_acc / max(n_prop, 1),
                "n_overweight": n_over, "w_max": float(w_max)}
        return events, xbs, wts, info
    # efficiency = E[v]/w_max over all proposals
    eff = v_sum / max(n_prop, 1) / w_max
    return events, xbs, eff, n_over


def _unweight_per_channel_max(channels, flows, params, states,
                              matrix_element, E_cm, key, alphas, n_events,
                              batch_per_channel, w_max, wmax_quantile,
                              max_batches, partial_unweight=False,
                              compact=True, rounds_per_call=8, **kw):
    """Per-channel-max unweighting (see :func:`multichannel_unweight`).

    ``w_max`` may be a length-C sequence of per-channel bounds; when
    absent the bounds come from one pilot batch per channel: the true
    pilot maxima at ``wmax_quantile=1``, else a GREEDY knapsack over the
    pooled pilot order statistics — repeatedly lower the threshold of
    whichever channel buys the largest ``alpha_k * delta(w_max_k)`` per
    unit of expected overweight rate, until the total expected
    overweight fraction of proposals reaches ``1 - wmax_quantile``.
    (The naive per-channel quantile is measurably WORSE than even the
    global scheme here: the pooled-v quantile already concentrates the
    overweight budget on the heaviest tail.)  Scheduling: each batch's
    source channel is drawn i.i.d. with probability
    ``∝ alpha_k w_max_k`` — i.i.d. batches keep the accepted sample
    exactly f-distributed under ANY stopping rule (a deterministic
    round-robin would bias the last, truncated round toward the channels
    scheduled first), while every dispatch keeps the fixed
    ``[batch_per_channel]`` shape.

    Small-budget degeneration: the knapsack's per-cut cost is
    ``shares_k / B`` of overweight rate, so when
    ``1 - wmax_quantile < min_k(shares_k) / B`` (small pilot batches or
    very tight quantiles) NO cut fits the budget and the thresholds
    silently degenerate to the strict pilot maxima — which can be much
    less efficient than the global pooled-quantile scheme at the same
    nominal quantile.  A warning is logged when that happens.

    Channels whose pilot maximum is 0 (e.g. every proposal fails cuts)
    are excluded from the schedule (``p_src[k] = 0``) and from the
    ``sum_k alpha_k w_max_k`` normalization instead of aborting; the
    accepted mixture is still exactly f-distributed because such a
    channel contributes nothing to f through its alpha-weighted density
    estimate ONLY if its true maximum is 0 — a pilot that merely missed
    the support under-covers that channel, so the pilot batch should be
    enlarged in that case (the warning names the dead channels).
    """
    C = len(channels)
    alphas = jnp.asarray(alphas)
    B = batch_per_channel

    anchors = _exec_anchors(channels, flows, params, states, matrix_element)
    skey = ("mcu_pc", C, B, E_cm, tuple(sorted(kw.items())))

    def make_batch_fn(k):
        def fn(kk, al):
            k_w, k_u = jax.random.split(kk)
            w, aux = mixture_weights(
                channels, flows, params, states, matrix_element, E_cm,
                k_w, B, al, with_kinematics=True, only_channel=k, **kw)
            u = jax.random.uniform(k_u, (B,), dtype=w.dtype)
            return w[0], u, aux["momenta"][0], aux["xb"][0]
        return fn

    batch_fns = [make_batch_fn(k) for k in range(C)]
    batch_jits = [_cached_jit(skey + ("batch", k),
                              lambda f=f: jax.jit(f), anchors)
                  for k, f in enumerate(batch_fns)]

    # sigma accumulators: pilot batches (when run) are folded in so every
    # channel contributes to the efficiency's sigma estimate even if it
    # never receives a generation batch (ADVICE r4)
    w_sum = np.zeros(C)
    n_prop_k = np.zeros(C, np.int64)

    pilots_v = None
    if w_max is None:
        pilots = []
        for k in range(C):
            key, sub = jax.random.split(key)
            v, _, _, _ = batch_jits[k](sub, alphas)
            v_np = np.asarray(v)
            w_sum[k] += float(v_np.sum())
            n_prop_k[k] += B
            pilots.append(np.sort(v_np)[::-1])
        pilots_v = pilots
        a_np = np.asarray(alphas, np.float64)
        t = np.array([p[0] for p in pilots])
        cuts = np.zeros(C, np.int64)
        eps = 1.0 - float(wmax_quantile)
        cap = max(int(B * max(eps, 1e-6) * 100), 10)
        while eps > 0:
            shares = a_np * t
            live = shares > 0
            shares = shares / shares.sum()
            frac = float(np.sum(shares * cuts / B))
            best, best_gain = -1, 0.0
            for k in range(C):
                if not live[k] or cuts[k] + 1 >= min(cap, B):
                    continue
                if frac + shares[k] / B > eps:
                    continue
                # gain per unit overweight rate: cutting channel k's next
                # order statistic lowers sum alpha_j w_max_j by
                # alpha_k * (t_k - next) at ~shares_k/B extra overweight
                gain = a_np[k] * (t[k] - pilots[k][cuts[k] + 1]) \
                    / (shares[k] / B)
                if gain > best_gain:
                    best_gain, best = gain, k
            if best < 0:
                break
            cuts[best] += 1
            t[best] = pilots[best][cuts[best]]
        if eps > 0 and not cuts.any():
            warnings.warn(
                "per-channel knapsack made zero cuts (budget "
                f"1-q={eps:.2e} < min share/B): thresholds degenerate to "
                "the strict pilot maxima; consider a larger "
                "batch_per_channel or a looser wmax_quantile",
                stacklevel=2)
        w_max = t * 1.05
    else:
        w_max = np.broadcast_to(np.asarray(w_max, np.float64),
                                (C,)).copy()
    if np.any(w_max < 0):
        raise ValueError(f"per-channel w_max must be non-negative: {w_max}")
    if np.all(w_max == 0):
        raise ValueError("all per-channel maxima are 0 — every pilot "
                         "proposal failed cuts in every channel")
    if np.any(w_max == 0):
        warnings.warn(
            "channels with zero pilot maximum excluded from the "
            f"schedule: {np.flatnonzero(w_max == 0).tolist()} — enlarge "
            "batch_per_channel if their true maxima are nonzero",
            stacklevel=2)

    rate = np.asarray(alphas, np.float64) * w_max
    p_src = rate / rate.sum()
    key, sub = jax.random.split(key)
    host_rng = np.random.default_rng(
        int(jax.random.randint(sub, (), 0, np.iinfo(np.int32).max)))

    out_ev, out_xb, out_w = [], [], []
    n_acc, n_prop, n_over = 0, 0, 0
    if partial_unweight:
        # Partial mode routinely runs at HIGH acceptance (aggressive
        # quantiles), so very few batches are drawn and the i.i.d. batch
        # schedule's per-batch channel granularity would dominate the
        # output composition.  Instead run EVERY live channel each round
        # and thin channel k by a_k = rate_k / max(rate): the accepted
        # weighted density from channel k is
        # q_k * a_k * min(1, w/w_max_k) * max(1, w/w_max_k)
        #   = q_k * a_k * w/w_max_k  ∝  alpha_k q_k f / q_hat,
        # summing to exactly f — with the cross-channel composition exact
        # per round (no scheduling noise), fixed shapes, and unbiasedness
        # under any stopping rule.  The thinning waste (1 - a_k on
        # channel k's proposals) is included in the reported efficiency.
        a_thin = rate / max(rate.max(), 1e-300)
        live = np.flatnonzero(rate > 0)

        def host_round(sub):
            subs = jax.random.split(sub, C)
            rates = {}
            nonlocal n_acc, n_prop, n_over
            for k in live:
                w, u, mom, xb = batch_jits[k](subs[k], alphas)
                r = np.asarray(w) / w_max[k]
                acc = np.asarray(u) < a_thin[k] * np.minimum(1.0, r)
                out_ev.append(np.asarray(mom)[acc])
                out_xb.append(np.asarray(xb)[acc])
                out_w.append(np.maximum(1.0, r[acc]))
                n_acc += int(acc.sum())
                n_prop += B
                n_prop_k[k] += B
                n_over += int((r > 1.0).sum())
                w_sum[k] += float(np.asarray(w).sum())
                rates[k] = float(acc.mean())
            return rates

        def make_rstep(caps_used):
            # one dispatch per rounds-group: every live channel's batch,
            # accept-reject, and row compaction run on device; the host
            # receives ONE packed payload + one [L, 4] stats block per
            # round (see _compact_rows for why that matters here).
            # w_max / a_thin are traced OPERANDS — as closure constants
            # every call would compile a new program (see make_cstep).
            def one(sub, wm, at, al):
                subs = jax.random.split(sub, C)
                payloads, stats = [], []
                for j, k in enumerate(live):
                    w, u, mom, xb = batch_fns[k](subs[k], al)
                    rr = w / wm[k]
                    acc = u < at[k] * jnp.minimum(1.0, rr)
                    payload, kept = _compact_rows(
                        mom, xb, rr, acc, caps_used[j],
                        jax.random.fold_in(subs[k], _PERM_SALT))
                    payloads.append(payload)
                    stats.append(jnp.stack([
                        kept.astype(w.dtype),
                        jnp.sum(acc).astype(w.dtype),
                        jnp.sum(rr > 1.0).astype(w.dtype),
                        jnp.sum(w)]))
                return jnp.concatenate(payloads, 0), jnp.stack(stats, 0)
            return _cached_jit(
                skey + ("rstep", tuple(caps_used), tuple(live.tolist())),
                lambda: jax.jit(lambda subs, wm, at, al: jax.lax.map(
                    lambda s: one(s, wm, at, al), subs)),
                anchors)

        if not compact:
            for _ in range(max_batches):
                key, sub = jax.random.split(key)
                host_round(sub)
                if n_acc >= n_events:
                    break
        else:
            r_call = max(int(rounds_per_call), 1)
            caps = None
            if pilots_v is not None:
                caps = [_size_capacity(
                    a_thin[k] * float(np.mean(np.minimum(
                        1.0, pilots_v[k] / w_max[k]))), B, floor=256)
                    for k in live]
            rstep, n_rounds = None, 0
            while n_rounds < max_batches and n_acc < n_events:
                if caps is None:  # w_max was given: size from one round
                    key, sub = jax.random.split(key)
                    rates = host_round(sub)
                    n_rounds += 1
                    caps = [_size_capacity(max(rates[k], 1.0 / B), B,
                                           floor=256) for k in live]
                    continue
                if rstep is None:
                    caps_used = list(caps)
                    offs = np.concatenate([[0], np.cumsum(caps_used)])
                    rstep = make_rstep(caps_used)
                subs = []
                for _ in range(r_call):
                    key, sub = jax.random.split(key)
                    subs.append(sub)
                payloads, stats = rstep(jnp.stack(subs),
                                        jnp.asarray(w_max),
                                        jnp.asarray(a_thin), alphas)
                payloads, stats = np.asarray(payloads), np.asarray(stats)
                for i in range(r_call):
                    for j, k in enumerate(live):
                        kept = int(stats[i, j, 0])
                        n_true = int(stats[i, j, 1])
                        rows = payloads[i, offs[j]:offs[j] + kept]
                        mom_i, xb_i, r_i = _unpack_rows(rows)
                        out_ev.append(mom_i)
                        out_xb.append(xb_i)
                        out_w.append(np.maximum(1.0, r_i))
                        n_acc += kept
                        n_prop += B
                        n_prop_k[k] += B
                        n_over += int(stats[i, j, 2])
                        w_sum[k] += float(stats[i, j, 3])
                        if n_true > caps_used[j] and caps[j] < B:
                            caps[j] = min(2 * caps_used[j], B)
                    n_rounds += 1
                if caps != caps_used:
                    rstep = None
        events = np.concatenate(out_ev, axis=0)
        xbs = np.concatenate(out_xb, axis=0)
        wts = np.concatenate(out_w, axis=0)
        kish = float(wts.sum()) ** 2 / max(float((wts ** 2).sum()), 1e-300)
        info = {"eff": kish / max(n_prop, 1),
                "accept_rate": n_acc / max(n_prop, 1),
                "n_overweight": n_over, "w_max": np.asarray(w_max)}
        return events, xbs, wts, info

    def make_cbatch(k, capacity):
        # w_max[k] / alphas are traced operands, not closure constants —
        # baked constants would recompile the program per call, and the
        # jit object itself is reused across calls (see _cached_jit)
        def fn(sub, wmk, al):
            w, u, mom, xb = batch_fns[k](sub, al)
            acc = u * wmk < w
            payload, kept = _compact_rows(
                mom, xb, w, acc, capacity,
                jax.random.fold_in(sub, _PERM_SALT))
            stats = jnp.stack([kept.astype(w.dtype),
                               jnp.sum(acc).astype(w.dtype),
                               jnp.sum(w > wmk).astype(w.dtype),
                               jnp.sum(w)])
            return payload, stats
        return _cached_jit(skey + ("cbatch", k, capacity),
                           lambda: jax.jit(fn), anchors)

    caps_pc, cbatch = [None] * C, [None] * C
    if compact and pilots_v is not None:
        for k in range(C):
            if w_max[k] > 0:
                caps_pc[k] = _size_capacity(float(np.mean(np.minimum(
                    1.0, pilots_v[k] / w_max[k]))), B, floor=256)

    for _ in range(max_batches):
        k = int(host_rng.choice(C, p=p_src))
        key, sub = jax.random.split(key)
        if compact and caps_pc[k] is not None:
            if cbatch[k] is None:
                cbatch[k] = make_cbatch(k, caps_pc[k])
            payload, stats = cbatch[k](sub, jnp.asarray(w_max[k]),
                                       alphas)
            payload, stats = np.asarray(payload), np.asarray(stats)
            kept, n_true = int(stats[0]), int(stats[1])
            mom_i, xb_i, _ = _unpack_rows(payload[:kept])
            out_ev.append(mom_i)
            out_xb.append(xb_i)
            n_acc += kept
            n_prop += B
            n_prop_k[k] += B
            n_over += int(stats[2])
            w_sum[k] += float(stats[3])
            if n_true > caps_pc[k] and caps_pc[k] < B:
                caps_pc[k] = min(2 * caps_pc[k], B)
                cbatch[k] = None
        else:
            w, u, mom, xb = batch_jits[k](sub, alphas)
            acc = np.asarray(u * w_max[k] < w)
            out_ev.append(np.asarray(mom)[acc])
            out_xb.append(np.asarray(xb)[acc])
            n_acc += int(acc.sum())
            n_prop += B
            n_prop_k[k] += B
            n_over += int(np.asarray(jnp.sum(w > w_max[k])))
            w_sum[k] += float(jnp.sum(w))
            if compact and caps_pc[k] is None:
                caps_pc[k] = _size_capacity(
                    max(float(acc.mean()), 1.0 / B), B, floor=256)
        if n_acc >= n_events:
            break
    events = np.concatenate(out_ev, axis=0)
    xbs = np.concatenate(out_xb, axis=0)
    # efficiency = sigma / sum_k alpha_k w_max_k, sigma estimated from the
    # proposals themselves incl. pilot batches: sigma = sum alpha_k E_k[w]
    ran = n_prop_k > 0
    sigma = float(np.sum(np.asarray(alphas)[ran] * w_sum[ran]
                         / n_prop_k[ran]))
    eff = sigma / float(np.sum(np.asarray(alphas) * w_max))
    return events, xbs, eff, n_over


def combine_stratified(w, alphas):
    """Combine stratified per-channel weights ``w [C, B]`` into the
    unbiased ``(integral, error, ess)``.  The estimate is the ALPHA-
    weighted sum of per-channel means (NOT a flat mean — channels are
    sampled equally but carry weight alpha_k), with the standard
    stratified error sum_k alpha_k^2 Var_k / B."""
    alphas = jnp.asarray(alphas, w.dtype)
    B = w.shape[1]
    m1 = jnp.sum(alphas * jnp.mean(w, axis=1))
    m2 = jnp.sum(alphas * jnp.mean(w ** 2, axis=1))
    var_k = jnp.var(w, axis=1, ddof=1)
    err = jnp.sqrt(jnp.sum(alphas ** 2 * var_k) / B)
    ess = m1 ** 2 / jnp.maximum(m2, 1e-300)
    return m1, err, ess
