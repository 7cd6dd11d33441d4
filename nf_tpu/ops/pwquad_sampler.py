"""Fused Pallas TPU sampling kernel for PWQuad / PWLin flows.

Production unweighting/integration draws billions of samples from a *trained*
flow; that path is the throughput headline (BASELINE.md north star: >=1e7
samples/sec/chip).  This kernel fuses, in one pass with zero HBM reads of
latent points:

    on-chip PRNG -> every coupling cell (folded conditioner MLP + piecewise-
    quadratic CDF + Jacobian product) -> x, jac written once to HBM

Design (see /opt/skills/guides/pallas_guide.md):
  * batch lives in the lane dimension: every per-dimension quantity is a
    ``[tile_sub, 128]`` f32 tile (tile_sub*128 samples per grid step), so
    all transform math is dense VPU work;
  * eval-mode BatchNorm layers are affine and are folded into the adjacent
    Linear weights host-side (``fold_eval_params``), leaving a bare
    dense+bias+ReLU MLP whose tiny matmuls are unrolled as scalar-broadcast
    FMAs from SMEM-resident weights;
  * the bin search is an unrolled masked select over ``n_bins`` (no gather);
  * uniform latents come from ``pltpu.prng_random_bits`` seeded per grid
    step, so the kernel is write-bandwidth-bound.

The jnp reference semantics live in nf_tpu.bijectors.coupling.pwquad_compute;
``test_pallas.py`` checks the kernel against that path (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_SUB = 32  # sublane tile height; samples per grid step = sub * 128


# ---------------------------------------------------------------------------
# Host-side parameter folding
# ---------------------------------------------------------------------------

def _fold_conditioner(params, state, eps=1e-5, dtype=np.float32):
    """Collapse eval-mode [BN] Linear [BN] chains into (W_eff, b_eff, relu)
    triples.

    Eval BatchNorm is affine: y = (x - m) / sqrt(v + eps) * g + b.  Folding it
    into the neighboring Linear keeps the MLP mathematically identical while
    removing all normalization work from the kernel.
    Returns ``[(W0, b0, relu_after), ...]``: hidden layers carry
    ``relu_after=True``; a low-rank final layer (conditioner.init
    ``final_rank``) contributes TWO linear-only triples (u then v) with no
    ReLU between — keeping it factored is the whole point (the kernel's
    FMA count follows the factor shapes, not the product).
    """
    def bn_affine(p, s):
        scale = np.asarray(p["scale"]) / np.sqrt(np.asarray(s["var"]) + eps)
        shift = np.asarray(p["bias"]) - np.asarray(s["mean"]) * scale
        return scale, shift

    layers = []
    # input BN folded into first linear
    s_in, t_in = bn_affine(params["bn_in"], state["bn_in"])
    for i, lin in enumerate(params["linears"]):
        w = np.asarray(lin["w"])
        b = np.asarray(lin.get("b", np.zeros(w.shape[1])))
        if i == 0:
            w_eff = s_in[:, None] * w
            b_eff = t_in @ w + b
        else:
            w_eff, b_eff = w, b
        # output BN of this hidden layer
        s_o, t_o = bn_affine(params["bns"][i], state["bns"][i])
        w_eff = w_eff * s_o[None, :]
        b_eff = b_eff * s_o + t_o
        layers.append((w_eff.astype(dtype), b_eff.astype(dtype), True))
    fin = params["final"]
    if "u" in fin:
        u = np.asarray(fin["u"]).astype(dtype)
        if not params["linears"]:
            # no hidden layers: fold the input BN into the first factor
            bu = (t_in @ np.asarray(fin["u"])).astype(dtype)
            u = (s_in[:, None] * np.asarray(fin["u"])).astype(dtype)
        else:
            bu = np.zeros(u.shape[1], dtype)
        layers.append((u, bu, False))
        layers.append((np.asarray(fin["v"]).astype(dtype),
                       np.asarray(fin["b"]).astype(dtype), False))
        return layers
    wf = np.asarray(fin["w"]).astype(dtype)
    bf = np.asarray(fin["b"]).astype(dtype)
    if not params["linears"]:
        wf = (s_in[:, None] * np.asarray(fin["w"])).astype(dtype)
        bf = (t_in @ np.asarray(fin["w"])).astype(dtype) + bf
    layers.append((wf, bf, False))
    return layers


def fold_eval_params(flow, params, state, dtype=np.float32):
    """Fold all cells; returns (static_plan, flat list of weight arrays)."""
    folded = []
    for p, s in zip(params, state):
        folded.append(_fold_conditioner(p, s, dtype=dtype))
    return folded


# ---------------------------------------------------------------------------
# Kernel body builders (all loops unrolled at trace time over static config)
# ---------------------------------------------------------------------------

def _mlp(xs_pass, weight_refs, layer_sizes):
    """Unrolled scalar-broadcast MLP on a list of [sub, LANE] activations.

    ``layer_sizes``: list of (fan_in, fan_out, relu_after) — see
    _fold_conditioner (a factored final layer appears as two ReLU-free
    entries)."""
    h = xs_pass
    ref_idx = 0
    for fan_in, fan_out, relu_after in layer_sizes:
        w_ref = weight_refs[ref_idx]
        b_ref = weight_refs[ref_idx + 1]
        ref_idx += 2
        out = []
        for o in range(fan_out):
            acc = jnp.full(h[0].shape, b_ref[o], dtype=jnp.float32)
            for i in range(fan_in):
                acc = acc + h[i] * w_ref[i, o]
            out.append(acc)
        if relu_after:
            out = [jnp.maximum(z, 0.0) for z in out]
        h = out
    return h


def _pos(z, act):
    """Kernel-side positivity map (see bijectors.coupling.positivity).

    squareplus trades the ~8-op exp lowering for 2 FMAs + sqrt — the exp
    count (2*n_bins+1 per transformed dim) is the largest single term in
    the kernel's VPU op budget after the conditioner matmuls.
    """
    if act == "exp":
        return jnp.exp(z)
    return 0.5 * (z + jnp.sqrt(z * z + 4.0))


def _pwquad_dim(z_v, z_w, xB, act="exp"):
    """One transformed dimension: lists of [sub,LANE] logits -> (yB, pdf).

    Mirrors nf_tpu.bijectors.coupling.pwquad_compute with the bin search and
    gathers unrolled as masked selects.
    """
    n_bins = len(z_w)
    w = [_pos(z, act) for z in z_w]
    v = [_pos(z, act) for z in z_v]

    wtot = w[0]
    for k in range(1, n_bins):
        wtot = wtot + w[k]
    inv_wtot = 1.0 / wtot
    w = [wk * inv_wtot for wk in w]

    vnorm = (v[0] + v[1]) * 0.5 * w[0]
    for k in range(1, n_bins):
        vnorm = vnorm + (v[k] + v[k + 1]) * 0.5 * w[k]
    inv_vnorm = 1.0 / vnorm
    v = [vk * inv_vnorm for vk in v]

    # edges and CDF-at-edge prefix sums, then masked select of the active bin
    zero = jnp.zeros_like(xB)
    edge = zero
    vw = zero
    w_b = zero
    edge_b = zero
    vw_b = zero
    v_lo = zero
    v_hi = zero
    for k in range(n_bins):
        nxt_edge = edge + w[k]
        upper = nxt_edge if k < n_bins - 1 else jnp.full_like(xB, 2.0)
        m = jnp.logical_and(xB >= edge, xB < upper).astype(jnp.float32)
        w_b = w_b + m * w[k]
        edge_b = edge_b + m * edge
        vw_b = vw_b + m * vw
        v_lo = v_lo + m * v[k]
        v_hi = v_hi + m * v[k + 1]
        vw = vw + (v[k] + v[k + 1]) * 0.5 * w[k]
        edge = nxt_edge

    alpha = (xB - edge_b) / w_b
    yB = 0.5 * alpha * alpha * (v_hi - v_lo) * w_b + alpha * v_lo * w_b + vw_b
    pdf = v_lo + (v_hi - v_lo) * alpha
    return yB, pdf


def _pwlin_dim(z_q, xB, act="exp"):
    """One piecewise-LINEAR transformed dimension (reference
    coupling_cells.py:107-142): list of n_bins [sub,LANE] logits -> (yB, pdf)."""
    n_bins = len(z_q)
    q = [_pos(z, act) for z in z_q]
    qtot = q[0]
    for k in range(1, n_bins):
        qtot = qtot + q[k]
    inv = 1.0 / qtot
    pdf = [qk * inv * n_bins for qk in q]       # mean-n_bins normalization

    t = xB * n_bins
    zero = jnp.zeros_like(xB)
    cdf_lo = zero
    pdf_b = zero
    base_b = zero
    cdf = zero
    for k in range(n_bins):
        upper = jnp.full_like(xB, float(k + 1)) \
            if k < n_bins - 1 else jnp.full_like(xB, 2.0 * n_bins)
        m = jnp.logical_and(t >= float(k), t < upper).astype(jnp.float32)
        pdf_b = pdf_b + m * pdf[k]
        cdf_lo = cdf_lo + m * cdf
        base_b = base_b + m * float(k)
        cdf = cdf + pdf[k] / n_bins
    alpha = (t - base_b) / n_bins
    yB = pdf_b * alpha + cdf_lo
    return yB, pdf_b


def _atan_pos(x):
    """atan for x >= 0 (Mosaic has no atan primitive).

    Cephes atanf range reduction: x > tan(3pi/8) -> pi/2 - atan(1/x);
    x > tan(pi/8) -> pi/4 + atan((x-1)/(x+1)); then a 4-term odd minimax
    polynomial on |z| <= tan(pi/8) (~1e-7 absolute error in f32).
    """
    t3p8 = jnp.float32(2.414213562373095)   # tan(3*pi/8)
    tp8 = jnp.float32(0.4142135623730950)   # tan(pi/8)
    big = x > t3p8
    mid = jnp.logical_and(x > tp8, jnp.logical_not(big))
    safe_x = jnp.maximum(x, jnp.float32(1e-30))
    z = jnp.where(big, 1.0 / safe_x,
                  jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    zz = z * z
    p = jnp.float32(8.05374449538e-2)
    p = p * zz - jnp.float32(1.38776856032e-1)
    p = p * zz + jnp.float32(1.99777106478e-1)
    p = p * zz - jnp.float32(3.33329491539e-1)
    r = p * zz * z + z
    return jnp.where(big, jnp.float32(math.pi / 2) - r,
                     jnp.where(mid, jnp.float32(math.pi / 4) + r, r))


def _affine_dim(z_s, z_t, xB):
    """One affine transformed dimension (reference coupling_cells.py:50-70).

    Returns (yB, per-dim pdf factor 20 e^s / (u^2+1)); the caller applies
    the single global 2/pi factor once per cell (reference quirk).
    u >= 0 always (xB, e^s, relu(t) all non-negative), so _atan_pos applies.
    """
    s0 = jnp.exp(z_s)
    s1 = jnp.maximum(z_t, 0.0)
    u = xB * (20.0 * s0) + s1
    diff = 1.0 / (u * u + 1.0)
    yB = _atan_pos(u) * jnp.float32(2.0 / math.pi)
    return yB, (20.0 * s0) * diff


def _uniform_from_bits(bits):
    """Random bits -> f32 uniforms in [0, 1).

    ``prng_random_bits`` may return *signed* int32; an arithmetic shift of
    negative bits would produce negative "uniforms" (and NaNs downstream),
    and Mosaic cannot cast uint32->f32, so mask down to the low 24 bits —
    always non-negative and exactly representable in f32.
    """
    bits24 = jnp.bitwise_and(bits.astype(jnp.int32), jnp.int32(0x00FFFFFF))
    return bits24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


# ---------------------------------------------------------------------------
# Sampler construction
# ---------------------------------------------------------------------------

def build_sampler(flow, params, state, interpret: bool = False,
                  tile_sub: int = DEFAULT_SUB, take_latents: bool = False,
                  layout: str = "batch_major"):
    """Compile a fused sampler for a (trained) PWQuad flow in eval mode.

    Returns ``sample(seed: int32, n: int) -> (x [n, n_flow] f32, jac [n] f32)``.
    ``n`` is rounded up to a multiple of ``tile_sub * 128`` internally and
    truncated on return.  ``tile_sub`` sets the per-grid-step tile height
    (samples per step = tile_sub * 128).

    ``layout="dim_major"`` returns ``x`` as ``[n_flow, n]`` — the kernel's
    native output layout — skipping the ``[n, n_flow]`` transpose copy
    (one extra HBM read+write of the whole sample block).  Use it when the
    consumer runs in the same jit and can slice rows (e.g. the fused
    ``integrate`` epilogue).

    ``take_latents=True`` builds the debug/equivalence variant: instead of
    the in-kernel PRNG, latent points come in as an operand and the
    signature becomes ``sample(latents [n, n_flow] f32) -> (x, jac)``.
    This variant (a) admits an *exact* on-device comparison against the jnp
    path on identical latents (the PRNG variant can only be validated
    statistically), and (b) runs in Pallas interpret mode on CPU, where the
    TPU PRNG primitives are unavailable.
    """
    for c in flow.cells:
        if c.kind not in ("pwquad", "pwlin", "affine"):
            raise ValueError(f"fused sampler: unsupported cell kind {c.kind!r}")

    folded = fold_eval_params(flow, params, state)
    n_flow = flow.n_flow

    # flat weight operand list + per-cell slices / static shapes
    flat_weights = []
    cell_meta = []
    for cfg, layers in zip(flow.cells, folded):
        sizes = [(w.shape[0], w.shape[1], relu) for w, _, relu in layers]
        start = len(flat_weights)
        for w, b, _relu in layers:
            flat_weights.append(np.ascontiguousarray(w))
            flat_weights.append(np.ascontiguousarray(b))
        cell_meta.append((cfg.kind, cfg.pass_through, cfg.n_bins, sizes, start,
                          cfg.activation))

    ops = flow.ops

    sub = tile_sub
    tile = sub * LANE

    def kernel(src_ref, *refs):
        x_out = refs[-2]
        jac_out = refs[-1]
        weight_refs = refs[:-2]

        if take_latents:
            xs = [src_ref[d] for d in range(n_flow)]
        else:
            pltpu.prng_seed(src_ref[0] + pl.program_id(0))
            bits = pltpu.prng_random_bits((n_flow, sub, LANE))
            xs = [_uniform_from_bits(bits[d]) for d in range(n_flow)]
        jac = jnp.ones((sub, LANE), jnp.float32)

        for op in ops:
            tag = op[0]
            if tag == "roll":
                s = op[1] % n_flow
                xs = xs[-s:] + xs[:-s] if s else xs
            elif tag == "gather":
                xs = [xs[p] for p in op[1]]
            elif tag == "scatter":
                inv = [0] * n_flow
                for pos, p in enumerate(op[1]):
                    inv[p] = pos
                xs = [xs[i] for i in inv]
            elif tag == "cell":
                kind, pass_through, n_bins, sizes, start, act = cell_meta[op[1]]
                t = n_flow - pass_through
                wrefs = weight_refs[start:start + 2 * len(sizes)]
                z = _mlp(xs[:pass_through], wrefs, sizes)
                new_tail = []
                if kind == "affine":
                    # conditioner emits [2, t]: scales then shifts
                    for ti in range(t):
                        yB, pdf = _affine_dim(z[ti], z[t + ti],
                                              xs[pass_through + ti])
                        new_tail.append(yB)
                        jac = jac * pdf
                    # single 2/pi factor per cell (reference quirk,
                    # coupling_cells.py:68)
                    jac = jac * jnp.float32(2.0 / math.pi)
                else:
                    width = (2 * n_bins + 1) if kind == "pwquad" else n_bins
                    for ti in range(t):
                        if kind == "pwquad":
                            xB = jnp.minimum(xs[pass_through + ti], 1.0 - 1e-6)
                            z_v = z[ti * width: ti * width + n_bins + 1]
                            z_w = z[ti * width + n_bins + 1: (ti + 1) * width]
                            yB, pdf = _pwquad_dim(z_v, z_w, xB, act)
                        else:
                            xB = xs[pass_through + ti]
                            z_q = z[ti * width: (ti + 1) * width]
                            yB, pdf = _pwlin_dim(z_q, xB, act)
                        new_tail.append(yB)
                        jac = jac * pdf
                xs = xs[:pass_through] + new_tail

        for d in range(n_flow):
            x_out[d] = xs[d]
        jac_out[0] = jac

    def _call(src_operand, src_spec, n, n_tiles):
        n_pad = n_tiles * tile
        in_specs = [src_spec]
        operands = [src_operand]
        for arr in flat_weights:
            a = jnp.asarray(arr)
            if a.ndim == 1:
                a = a.reshape(-1)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            operands.append(a)

        x_t, jac_t = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((n_flow, sub, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sub, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_flow, n_tiles * sub, LANE), jnp.float32),
                jax.ShapeDtypeStruct((1, n_tiles * sub, LANE), jnp.float32),
            ),
            interpret=interpret,
        )(*operands)
        if layout == "dim_major":
            x = x_t.reshape(n_flow, n_pad)[:, :n]
        else:
            x = x_t.reshape(n_flow, n_pad).T[:n]
        jac = jac_t.reshape(n_pad)[:n]
        return x, jac

    if take_latents:
        def sample(latents):
            n = latents.shape[0]
            n_tiles = -(-n // tile)
            n_pad = n_tiles * tile
            lat = jnp.pad(latents.astype(jnp.float32),
                          ((0, n_pad - n), (0, 0)), constant_values=0.5)
            lat_t = lat.T.reshape(n_flow, n_tiles * sub, LANE)
            spec = pl.BlockSpec((n_flow, sub, LANE), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
            return _call(lat_t, spec, n, n_tiles)
    else:
        def sample(seed, n):
            n_tiles = -(-n // tile)
            spec = pl.BlockSpec(memory_space=pltpu.SMEM)
            return _call(jnp.asarray([seed], jnp.int32), spec, n, n_tiles)

    return sample


def estimate_vpu_ops(flow, exp_cost=8, atan_cost=20, sp_cost=5):
    """Static estimate of VPU element-ops per sample for the fused kernel.

    Counts one op per elementwise instruction per sample position (FMA = 1)
    with transcendental lowering costs ``exp_cost``/``atan_cost`` (Mosaic
    expands exp/atan into ~8/~20-op polynomial sequences).  Accuracy is
    ~±30% — the point is the roofline ORDER: dividing the measured
    samples/s by this count gives sustained element-ops/s to compare
    against the VPU issue-rate peak (8 sublanes x 128 lanes x ~4 ops/cycle
    x ~0.94 GHz ~= 3.9e12/s on v5e).  See BENCH kernel_roofline.
    """
    total = 3 * flow.n_flow  # PRNG bits -> uniform per dimension
    for cfg in flow.cells:
        t = flow.flow_size - cfg.pass_through if hasattr(flow, "flow_size") \
            else cfg.flow_size - cfg.pass_through
        # conditioner MLP: fan_in*fan_out FMAs + bias + ReLU per layer
        dims = [cfg.pass_through] + list(cfg.nn_sizes)
        sizes = list(zip(dims[:-1], dims[1:]))
        if cfg.final_rank is not None:
            # factored final: prev->r (biasless) then r->out
            fi, fo = sizes[-1]
            sizes = sizes[:-1] + [(fi, cfg.final_rank), (cfg.final_rank, fo)]
        for fi, fo in sizes:
            total += fi * fo + fo
        n_relu = len(cfg.nn_sizes) - 1
        total += sum(fo for _, fo in sizes[:n_relu])  # ReLU after hiddens only
        nb = cfg.n_bins
        pos_cost = exp_cost if cfg.activation == "exp" else sp_cost
        if cfg.kind == "pwquad":
            per_dim = pos_cost * (2 * nb + 1) + 5 * nb + 12 + 8 * nb + 12
        elif cfg.kind == "pwlin":
            per_dim = pos_cost * nb + 8 * nb + 12
        else:
            per_dim = exp_cost + atan_cost + 12
        total += t * (per_dim + 1)  # + jacobian multiply
    return total


def make_jit_sampler(flow, params, state, n, interpret=False,
                     tile_sub=DEFAULT_SUB):
    """Jitted fixed-size sampler: ``f(seed) -> (x, jac)``."""
    sampler = build_sampler(flow, params, state, interpret=interpret,
                            tile_sub=tile_sub)
    return jax.jit(functools.partial(sampler, n=n))
