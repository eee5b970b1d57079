"""Device mesh and replicate sharding.

The reference's only scaling mechanism is GNU-Parallel process fan-out over
independent (bootstrap replicate x split time) likelihood problems
(README.md:110-115, test.bs/*.sh).  The TPU-native equivalent: a 1-D
`jax.sharding.Mesh` over all devices with the bootstrap-replicate axis
sharded across it; per-replicate fits are vmapped within a chip and the
result tables are gathered with XLA collectives over ICI/DCN instead of
grep/awk over text files.

Multi-host: call `init_distributed()` once per process before `make_mesh()`;
jax.distributed wires the hosts and `jax.devices()` becomes global.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPLICATE_AXIS = "rep"


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise multi-host JAX (no-op for single-process runs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the replicate axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (REPLICATE_AXIS,))


def shard_replicates(mesh: Mesh, arr):
    """Place a batch array with axis 0 sharded over the replicate axis."""
    spec = P(REPLICATE_AXIS, *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(REPLICATE_AXIS, *([None] * (ndim - 1))))


def pad_to_multiple(arr: np.ndarray, multiple: int, fill=0.0):
    """Pad axis 0 to a device-count multiple; returns (padded, original_len)."""
    b = arr.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return arr, b
    pad = np.full((rem, *arr.shape[1:]), fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0), b
