"""Fused training kernels (nf_tpu.ops.pwquad_train; docs/TRAIN_KERNEL.md).

The kernels implement frozen-statistics training: forward == the folded
eval path bit-for-bit structure (same math as fast_eval/make_folded_forward
with the clamp), backward == the hand-derived closed-form VJP.  These tests
pin, in Pallas interpret mode on CPU:

  1. fold_flow_jnp == the host np fold (pwquad_sampler.fold_eval_params);
  2. kernel forward == folded_forward_ref == the stateful eval forward;
  3. kernel VJP == jax autodiff of folded_forward_ref, for both the jac
     cotangent (the variance-loss path) and the x cotangent (pathwise),
     w.r.t. every folded array AND the latents;
  4. end-to-end grads w.r.t. RAW parameters (through the differentiable
     fold) == autodiff of the composed jnp path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nf_tpu.flows import factory, model as fmodel
from nf_tpu.ops import pwquad_train as ptk
from nf_tpu.ops.pwquad_sampler import fold_eval_params

def _masked_mini(k):
    """Handcrafted 2-cell masked flow: exercises the gather/scatter
    cotangent path at a fraction of the factory masked build's interpret
    cost (interpret mode executes per-op Python; the full 2n-cell masked
    factory config ran >50 min on this 1-core host)."""
    from nf_tpu.bijectors.permutations import mask_partition
    from nf_tpu.flows.model import Flow, make_cell_cfg, init_cell

    n_flow = 4
    cells, ops = [], []
    for i in range(2):
        feeder, trafoer = mask_partition(n_flow, i)
        perm = tuple(feeder.tolist() + trafoer.tolist())
        cells.append(make_cell_cfg("pwquad", n_flow, len(feeder), 3, (4,)))
        ops.append(("gather", perm))
        ops.append(("cell", i))
        ops.append(("scatter", perm))
    flow = Flow(n_flow, tuple(cells), tuple(ops))
    keys = jax.random.split(k, 2)
    ps, ss = zip(*[init_cell(keys[i], cells[i], jnp.float32)
                   for i in range(2)])
    return flow, list(ps), list(ss)


CONFIGS = [
    ("camel", lambda k: factory.build_pwquad_flow(
        k, 2, 2, 4, (3, 3, 3), jnp.float32)),
    ("masked_mini", _masked_mini),
    ("rank_sp", lambda k: factory.build_pwquad_flow(
        k, 3, 2, 3, (4,), jnp.float32,
        final_rank=2, activation="squareplus")),
    ("pwlin", lambda k: factory.build_pwlin_flow(
        k, 3, 1, 2, 4, (5,), 1, jnp.float32)),
    ("affine", lambda k: factory.build_affine_flow(
        k, 3, 2, 2, (5,), 1, jnp.float32)),
]


def _setup(build, n=384, seed=0):
    flow, params, state = build(jax.random.PRNGKey(seed))
    # train the BN state away from init so folds are nontrivial
    w0 = jax.random.uniform(jax.random.PRNGKey(seed + 1), (256, flow.n_flow),
                            dtype=jnp.float32)
    _, _, state = fmodel.forward(flow, params, state, w0, True)
    flat, meta = ptk.fold_flow_jnp(flow, params, state)
    w = jax.random.uniform(jax.random.PRNGKey(seed + 2), (n, flow.n_flow),
                           dtype=jnp.float32)
    return flow, params, state, flat, meta, w


@pytest.mark.parametrize("name,build", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_fold_jnp_matches_np(name, build):
    flow, params, state, flat, meta, _ = _setup(build)
    folded_np = fold_eval_params(flow, params, state)
    i = 0
    for layers in folded_np:
        for wm, bv, relu in layers:
            np.testing.assert_allclose(np.asarray(flat[i]), wm, rtol=2e-6,
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(flat[i + 1]), bv,
                                       rtol=2e-6, atol=1e-7)
            i += 2
    assert i == len(flat)


@pytest.mark.parametrize("name,build", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_forward_matches_reference(name, build):
    flow, params, state, flat, meta, w = _setup(build)
    x_ref, jac_ref = ptk.folded_forward_ref(flow, meta, flat, w)
    # the frozen-stats reference must itself equal the eval-mode stateful
    # forward (same math, BN folded)
    x_ev, jac_ev, _ = fmodel.forward(flow, params, state, w, False)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_ev),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(jac_ref), np.asarray(jac_ev),
                               rtol=2e-4)

    fwd_k, _ = ptk.build_train_kernels(flow, meta, interpret=True)
    x_k, jac_k, stage = fwd_k(flat, w)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), atol=3e-6)
    np.testing.assert_allclose(np.asarray(jac_k), np.asarray(jac_ref),
                               rtol=3e-5)
    # staged residuals: cell 0's input state is the latents (possibly
    # permuted by leading ops; for these builds cell 0 comes first)
    assert stage.shape[0] == len(flow.cells)


@pytest.mark.parametrize("name,build", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.slow
def test_vjp_matches_autodiff(name, build):
    flow, params, state, flat, meta, w = _setup(build, n=384)
    f = ptk.make_fused_train_fn(flow, meta, interpret=True)

    kx = jax.random.normal(jax.random.PRNGKey(7), (384, flow.n_flow),
                           dtype=jnp.float32) * 0.3
    kj = jax.random.normal(jax.random.PRNGKey(8), (384,),
                           dtype=jnp.float32)

    def loss_kernel(fl, wl):
        x, jac = f(fl, wl)
        return jnp.sum(x * kx) + jnp.sum(jac * kj) \
            + jnp.mean((jac - jnp.mean(jac)) ** 2)

    def loss_ref(fl, wl):
        x, jac = ptk.folded_forward_ref(flow, meta, fl, wl)
        return jnp.sum(x * kx) + jnp.sum(jac * kj) \
            + jnp.mean((jac - jnp.mean(jac)) ** 2)

    gk_f, gk_w = jax.grad(loss_kernel, argnums=(0, 1))(flat, w)
    gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(flat, w)
    for a, b in zip(gk_f, gr_f):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=2e-3)
    scale = max(float(jnp.max(jnp.abs(gr_w))), 1e-3)
    np.testing.assert_allclose(np.asarray(gk_w), np.asarray(gr_w),
                               atol=2e-4 * scale, rtol=2e-3)


@pytest.mark.slow
def test_end_to_end_raw_param_grads():
    """Grads w.r.t. RAW params through the differentiable fold equal
    autodiff of the composed frozen-stats jnp path."""
    flow, params, state, flat, meta, w = _setup(CONFIGS[0][1], n=256)
    f = ptk.make_fused_train_fn(flow, meta, interpret=True)

    def loss_kernel(p):
        fl, _ = ptk.fold_flow_jnp(flow, p, state)
        x, jac = f(fl, w)
        return jnp.mean((jac - jnp.mean(jac)) ** 2) + jnp.sum(x) * 1e-3

    def loss_ref(p):
        fl, _ = ptk.fold_flow_jnp(flow, p, state)
        x, jac = ptk.folded_forward_ref(flow, meta, fl, w)
        return jnp.mean((jac - jnp.mean(jac)) ** 2) + jnp.sum(x) * 1e-3

    gk = jax.grad(loss_kernel)(params)
    gr = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4 * scale, rtol=3e-3)


def _camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.04)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.04))


def test_manager_stale_mode_converges():
    """bn_stats="stale" (frozen-stats gradients, periodic stats refresh)
    trains camel-2D to quality comparable with the reference "batch"
    semantics.  On CPU this exercises the identical-math XLA fallback; the
    Pallas kernel path is pinned separately below and in the VJP tests."""
    from nf_tpu.training.manager import PWQuadManager
    from nf_tpu.training import optimizers

    results = {}
    for mode in ("batch", "stale"):
        nf = PWQuadManager(n_flow=2, seed=0)
        nf.create_model(2, 4, [3] * 3)
        nf._train_variance_forward_seq(
            _camel, optimizers.adamax(2e-3, 1e-4), log=False,
            batch_size=2000, epochs=60, preburn_time=5, kill_counter=1000,
            mini_batch_size=2000, pretty_progressbar=False, integrate=True,
            bn_stats=mode)
        results[mode] = float(nf.best_loss)
        assert nf.best_loss < nf.int_loss  # beat uniform sampling
    # same order of quality (stale may differ either way within ~2x on
    # this short run; the guard is against silent breakage, not noise)
    assert results["stale"] < 2.0 * results["batch"]


def test_manager_stale_kernel_forced():
    """The fused Pallas kernel trains end-to-end through the manager
    (interpret mode, tiny run): fold -> kernel fwd -> custom VJP -> optax."""
    from nf_tpu.training.manager import PWQuadManager
    from nf_tpu.training import optimizers

    nf = PWQuadManager(n_flow=2, seed=0)
    nf.create_model(2, 4, [3] * 3)
    nf._train_variance_forward_seq(
        _camel, optimizers.adamax(2e-3, 1e-4), log=False,
        batch_size=256, epochs=3, preburn_time=1, mini_batch_size=256,
        pretty_progressbar=False, bn_stats="stale",
        _force_train_kernel=True, epochs_per_sync=1)
    assert np.isfinite(float(nf.best_loss))


def test_fwd_stats_byproduct():
    """with_stats=True: the forward kernel's accumulated (sum, sum^2) per
    pre-relu column equals a direct jnp computation over the SAME valid
    samples (n deliberately not a tile multiple, so the padding mask is
    load-bearing), and unfold_layer_stats inverts the fold affine."""
    flow, params, state, flat, meta, _ = _setup(CONFIGS[0][1])
    n = 300  # not a multiple of sub*128
    w = jax.random.uniform(jax.random.PRNGKey(9), (n, flow.n_flow),
                           dtype=jnp.float32)
    fwd_k, _ = ptk.build_train_kernels(flow, meta, interpret=True,
                                       with_stats=True)
    x_k, jac_k, stage, stats = fwd_k(flat, w)

    # direct recomputation of every pre-relu column from the STAGED cell
    # inputs (exact: the stage IS each cell's true input)
    starts = []
    li = 0
    for sizes in meta:
        starts.append(li)
        li += 2 * len(sizes)
    expect = []
    st = np.asarray(stage)
    for ci, cfg in enumerate(flow.cells):
        pt = cfg.pass_through
        xa = st[ci, :, :].reshape(flow.n_flow, -1).T[:n][:, :pt]
        h = xa.astype(np.float64)
        for c in range(pt):  # xA columns: the input BN's raw input
            expect.append((h[:, c].sum(), (h[:, c] ** 2).sum()))
        base = starts[ci]
        for j, (fi, fo, relu) in enumerate(meta[ci]):
            pre = h @ np.asarray(flat[base + 2 * j], np.float64) \
                + np.asarray(flat[base + 2 * j + 1], np.float64)
            if relu:
                for o in range(fo):
                    expect.append((pre[:, o].sum(), (pre[:, o] ** 2).sum()))
                h = np.maximum(pre, 0.0)
            else:
                h = pre
    got = np.asarray(stats, np.float64)
    assert got.shape[0] == 2 * len(expect)
    for k, (es, esq) in enumerate(expect):
        np.testing.assert_allclose(got[2 * k], es, rtol=3e-5)
        np.testing.assert_allclose(got[2 * k + 1], esq, rtol=3e-5)

    # affine inversion round-trip
    affs = ptk.fold_cell_affines(params[0], state[0])
    s_o, t_o = affs[0]
    rng = np.random.default_rng(0)
    hcol = rng.normal(size=500)
    y = s_o[0] * hcol + t_o[0]
    m, v = ptk.unfold_layer_stats(y.sum(), (y ** 2).sum(), 500.0,
                                  s_o[0], t_o[0])
    np.testing.assert_allclose(m, hcol.mean(), rtol=1e-6)
    np.testing.assert_allclose(v, hcol.var(), rtol=1e-6)


def test_stats_to_bn_state_matches_direct():
    """stats_to_bn_state (kernel sums -> torch-momentum EMA) equals a
    direct unfolded computation: eval-BN with the stale stats, raw linear,
    batch mean/var, EMA with unbiased variance."""
    flow, params, state, flat, meta, _ = _setup(CONFIGS[0][1])
    n = 300
    w = jax.random.uniform(jax.random.PRNGKey(11), (n, flow.n_flow),
                           dtype=jnp.float32)
    fwd_k, _ = ptk.build_train_kernels(flow, meta, interpret=True,
                                       with_stats=True)
    _, _, stage, stats = fwd_k(flat, w)
    new_bn = ptk.stats_to_bn_state(flow, meta, params, state, stats, n)

    EPS, MOM = 1e-5, 0.1
    st = np.asarray(stage, np.float64)
    for ci, cfg in enumerate(flow.cells):
        pt = cfg.pass_through
        xa = st[ci].reshape(flow.n_flow, -1).T[:n][:, :pt]
        # input BN stats
        m, v = xa.mean(0), xa.var(0)
        exp_m = 0.9 * np.asarray(state[ci]["bn_in"]["mean"]) + MOM * m
        exp_v = 0.9 * np.asarray(state[ci]["bn_in"]["var"]) \
            + MOM * v * n / (n - 1)
        np.testing.assert_allclose(np.asarray(new_bn[ci]["bn_in"]["mean"]),
                                   exp_m, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(new_bn[ci]["bn_in"]["var"]),
                                   exp_v, rtol=2e-4)
        # hidden BN layers: eval-BN with stale stats, raw linear
        h = (xa - np.asarray(state[ci]["bn_in"]["mean"])) \
            / np.sqrt(np.asarray(state[ci]["bn_in"]["var"]) + EPS) \
            * np.asarray(params[ci]["bn_in"]["scale"]) \
            + np.asarray(params[ci]["bn_in"]["bias"])
        for li, lin in enumerate(params[ci]["linears"]):
            pre = h @ np.asarray(lin["w"])
            if "b" in lin:
                pre = pre + np.asarray(lin["b"])
            m, v = pre.mean(0), pre.var(0)
            old = state[ci]["bns"][li]
            exp_m = 0.9 * np.asarray(old["mean"]) + MOM * m
            exp_v = 0.9 * np.asarray(old["var"]) + MOM * v * n / (n - 1)
            got = new_bn[ci]["bns"][li]
            np.testing.assert_allclose(np.asarray(got["mean"]), exp_m,
                                       rtol=5e-4, atol=5e-6)
            np.testing.assert_allclose(np.asarray(got["var"]), exp_v,
                                       rtol=2e-3, atol=5e-6)
            # continue the chain: BN eval with stale stats + relu
            bnp, bns = params[ci]["bns"][li], state[ci]["bns"][li]
            h = np.maximum(
                (pre - np.asarray(bns["mean"]))
                / np.sqrt(np.asarray(bns["var"]) + EPS)
                * np.asarray(bnp["scale"]) + np.asarray(bnp["bias"]), 0.0)


def test_manager_stale_kernel_stats_refresh():
    """Kernel-forced stale training with stats_every=1: the running BN
    statistics move via the kernel byproduct (no XLA refresh), and the
    run completes."""
    from nf_tpu.training.manager import PWQuadManager
    from nf_tpu.training import optimizers

    nf = PWQuadManager(n_flow=2, seed=0)
    nf.create_model(2, 4, [3] * 3)
    bn0 = jax.tree.map(lambda a: np.asarray(a).copy(), nf._bn_state)
    nf._train_variance_forward_seq(
        _camel, optimizers.adamax(2e-3, 1e-4), log=False,
        batch_size=256, epochs=3, preburn_time=1, mini_batch_size=256,
        pretty_progressbar=False, bn_stats="stale", stats_every=1,
        _force_train_kernel=True, epochs_per_sync=1)
    assert np.isfinite(float(nf.best_loss))
    moved = any(not np.allclose(np.asarray(a), b)
                for a, b in zip(jax.tree.leaves(nf._bn_state),
                                jax.tree.leaves(bn0)))
    assert moved  # the byproduct-driven EMA actually updated the stats
