"""Device mesh + sharding layout for data-parallel training.

The reference's parallelism is single-host ``torch.nn.DataParallel``
(trainer.py:74,93) plus a dead DDP path (finetune/train_ft_SQLdepth.py:
103-145). The TPU-native equivalent is one SPMD program over a
``jax.sharding.Mesh`` with a ``data`` axis:

  * batch tensors sharded on axis 0 over ``data`` (rides ICI),
  * params / optimizer state replicated,
  * gradient all-reduce inserted automatically by XLA when the jitted
    train step reduces the loss over the global batch.

Multi-slice (DCN) scaling needs no new code — build the mesh over all
processes' devices and the same shardings apply.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def auto_mesh_size(batch_size: int, n_devices: Optional[int] = None) -> int:
    """Largest device count <= available that divides the global batch."""
    avail = n_devices or len(jax.devices())
    for n in range(min(avail, batch_size), 0, -1):
        if batch_size % n == 0:
            return n
    return 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of [B, ...] host arrays with batch sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
