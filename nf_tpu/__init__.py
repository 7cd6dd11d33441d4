"""nf_tpu — TPU-native neural importance sampling with normalizing flows.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NGoetz/NF
("nisrep"): piecewise-linear / piecewise-quadratic / affine coupling-cell
bijectors (Muller et al. 2019), a variance-loss trainer with preburn and
best-model checkpointing, a Monte-Carlo integrator, and a "RAMBO on diet"
(Platzer, arXiv:1308.2922) flat phase-space generator with PDF convolution
and pT/deltaR/rapidity cuts.

Architecture notes (TPU-first, not a port):
  * Bijectors are pure functions ``(params, state, x, jac) -> (y, jac', state')``
    composed from a static plan; the reference packs the running Jacobian as an
    extra tensor column (reference layers.py:66-77) — we carry it separately.
  * Training steps are jit-compiled with ``lax.scan`` minibatch accumulation;
    data parallelism is ``shard_map`` over a ``jax.sharding.Mesh`` with ``psum``
    reductions (the reference is single-device, manager.py:76).
  * The hot PWQuad sampling path has a fused Pallas TPU kernel
    (``nf_tpu.ops``) in addition to the reference jnp path.
"""

from nf_tpu.training.manager import (
    BasicManager,
    AffineManager,
    PWLinManager,
    PWQuadManager,
)
from nf_tpu.phasespace.generator import (
    FlatInvertiblePhasespace,
    PhaseSpaceGeneratorError,
)

__version__ = "0.1.0"

__all__ = [
    "BasicManager",
    "AffineManager",
    "PWLinManager",
    "PWQuadManager",
    "FlatInvertiblePhasespace",
    "PhaseSpaceGeneratorError",
]
