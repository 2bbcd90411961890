"""Device mesh + sharding utilities for data-parallel training.

The reference has no parallelism of any kind (SURVEY §2.3: single CPU
process, batch 1). The TPU-native scale-out story is a 1-D data-parallel
mesh: batch sharded over the 'data' axis, parameters/optimizer state
replicated, gradient all-reduce inserted by XLA over ICI when the jitted
train step consumes sharded batches against replicated params
(BASELINE.json configs[4]: v5e-8 DP bf16).

Shardings are expressed with ``NamedSharding`` only — no per-device
plumbing — so the same step runs on 1 chip, a v5e-8, or the 8-device
virtual CPU mesh used in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch with its leading dim sharded over the mesh."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Right-pad the batch dim to a device-count multiple; returns
    (padded, real_count). Static shapes demand full batches per shard."""
    b = batch.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch, b
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), b
