"""Measure the effect of 24-bit latent granularity on tail statistics.

The fused Pallas kernel derives uniforms from the low 24 bits of the TPU
PRNG (granularity 2^-24; see nf_tpu/ops/pwquad_sampler.py::_uniform_from_bits
— Mosaic cannot cast uint32->f32, so the high bits are masked off).  This
script quantifies what that granularity does to the quantities VERDICT r1
flagged as unmeasured: w_max, the unweighting efficiency E[w]/max(w), and
upper weight quantiles on a *peaked* integrand, by pushing the same latent
stream through the flow at three resolutions:

  * f64   — jax.random.uniform in float64 (the reference-parity resolution),
  * q24   — the same latents floored to 24-bit granularity (the kernel's),
  * f32   — jax.random.uniform in float32 (23-bit mantissa granularity,
            what any f32 sampler, including torch.rand(float32), gives).

The transform runs in f64 for all three so the ONLY difference is latent
granularity.  Results go to stdout; STATUS.md records the conclusion.

Run: JAX_PLATFORMS=cpu python tools/measure_latent_bits.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")  # beat programmatic overrides
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def peaked(x):
    """Narrow 2-D Gaussian (sigma=0.01): ~1e4x more peaked than the camel."""
    return jnp.exp(-((x[:, 0] - 0.5) ** 2 + (x[:, 1] - 0.5) ** 2) / 2e-4)


def main():
    from nf_tpu import PWQuadManager
    from nf_tpu.training import optimizers
    from nf_tpu.flows.fast_eval import make_folded_forward

    NF = PWQuadManager(n_flow=2, seed=0, dtype=jnp.float64)
    NF.create_model(2, 16, [8] * 2)
    opt = optimizers.adamax(2e-3, 1e-4)
    NF._train_variance_forward_seq(
        peaked, opt, log=False, batch_size=20000, epochs=120,
        pretty_progressbar=False, mini_batch_size=10000, integrate=False,
        preburn_time=20)
    params, state = NF.best_params
    fwd = jax.jit(make_folded_forward(NF._flow, params, state, jnp.float64))

    n, n_batches = 1 << 20, 8
    stats = {k: [] for k in ("f64", "q24", "f32")}
    for b in range(n_batches):
        key = jax.random.PRNGKey(100 + b)
        w64 = jax.random.uniform(key, (n, 2), jnp.float64)
        variants = {
            "f64": w64,
            "q24": jnp.floor(w64 * (1 << 24)) / (1 << 24),
            "f32": jax.random.uniform(key, (n, 2), jnp.float32
                                      ).astype(jnp.float64),
        }
        for name, w in variants.items():
            x, jac = fwd(w)
            ws = np.asarray(peaked(x) * jac)
            stats[name].append(ws)

    print(f"{'variant':>8} {'w_max':>12} {'q99.99%':>12} {'q99.9%':>12} "
          f"{'E[w]':>12} {'eff=E/max':>12} {'integral':>12}")
    for name, chunks in stats.items():
        ws = np.concatenate(chunks)
        wmax = ws.max()
        print(f"{name:>8} {wmax:12.6e} {np.quantile(ws, 0.9999):12.6e} "
              f"{np.quantile(ws, 0.999):12.6e} {ws.mean():12.6e} "
              f"{ws.mean() / wmax:12.6f} {ws.mean():12.6e}")

    ws64 = np.concatenate(stats["f64"])
    ws24 = np.concatenate(stats["q24"])
    rel = abs(ws24.max() - ws64.max()) / ws64.max()
    eff64 = ws64.mean() / ws64.max()
    eff24 = ws24.mean() / ws24.max()
    print(f"\nw_max rel diff (q24 vs f64): {rel:.3e}")
    print(f"unweighting eff: f64={eff64:.6f}  q24={eff24:.6f} "
          f"(rel diff {abs(eff24 - eff64) / eff64:.3e})")


if __name__ == "__main__":
    main()
