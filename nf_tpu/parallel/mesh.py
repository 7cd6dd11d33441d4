"""Device-mesh helpers for data-parallel training.

The reference is single-device (manager.py:76); here batch data parallelism
over the ICI mesh is first-class.  The scaling axis of this workload is the
sample batch (neval up to 1e7+), so a 1-D 'dp' mesh over all chips is the
right layout: per-device RNG lanes generate disjoint latent slices, the flow
params are replicated, and loss/integral/variance accumulators reduce with
``psum`` over ICI (XLA inserts these from the sharding constraints).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "dp") -> Mesh:
    """A 1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_parallel_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up: ``jax.distributed.initialize`` + a global mesh.

    On a multi-host pod slice, call once per host before any jax op; all
    hosts then see the full device set and ``make_mesh()`` spans the slice
    (DP collectives ride ICI within hosts and DCN across, handled by XLA).
    Single-host callers can skip this entirely.  Arguments default to the
    cluster-env auto-detection built into jax.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return make_mesh()
