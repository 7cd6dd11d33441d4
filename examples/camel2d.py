"""README example: train a PWQuad flow on the 2-D camel and integrate.

Mirrors the reference's README usage (reference README.md:32-46); the camel
(two Gaussians on the diagonal) is the canonical correlated integrand that
defeats coordinate-wise VEGAS.

Run:  python examples/camel2d.py
"""

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import math

import jax.numpy as jnp

from nf_tpu import PWQuadManager
from nf_tpu.training import optimizers
from nf_tpu.training.vegas import VegasIntegrator


def camel(x):
    return (jnp.exp(-((x[:, 0] - 0.75) ** 2 + (x[:, 1] - 0.75) ** 2) / 0.2 ** 2)
            + jnp.exp(-((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / 0.2 ** 2))


def main():
    g = 0.2 * (math.sqrt(math.pi) / 2) * (math.erf(1.25) + math.erf(3.75))
    exact = 2 * g * g

    NF = PWQuadManager(n_flow=2, seed=0)
    NF.create_model(2, 4, [3] * 3)
    opt = optimizers.adamax(2e-3, 1e-4)
    print("training NIS flow ...")
    NF._train_variance_forward_seq(
        camel, opt, log=False, batch_size=10000, epochs=300,
        pretty_progressbar=True, integrate=True, preburn_time=50)
    sig, err = NF.integrate(camel, nitn=10, neval=100_000)
    print(f"NIS:   {sig:.6f} +/- {err:.2e}   (exact {exact:.6f}, "
          f"pull {(sig - exact) / err:+.1f} sigma)")

    print("running VEGAS baseline ...")
    vi = VegasIntegrator(2, n_bins=50, seed=0)
    mean, sdev = vi.run(camel, nitn=10, neval=100_000)
    print(f"VEGAS: {mean:.6f} +/- {sdev:.2e}")
    print("(VEGAS error is larger: coordinate-wise adaption cannot factor "
          "the diagonal correlation)")


if __name__ == "__main__":
    main()
