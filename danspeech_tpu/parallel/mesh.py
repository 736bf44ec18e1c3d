"""Device mesh construction + named sharding helpers.

The reference has no distributed layer at all (SURVEY §2.5); this module is
the SPMD foundation: a ('data', 'model') mesh, NamedShardings for parameter
and activation pytrees, and multi-host initialization. XLA inserts the
collectives (psum/all-gather) over ICI from the sharding annotations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis (pure DP); pass ``n_model`` > 1
    to carve out a tensor-parallel axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays (leading axis over 'data')."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime for a multi-host pod slice.

    Thin wrapper over jax.distributed.initialize — the TPU-native analog of
    a NCCL/MPI process group (none exists in the reference).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
