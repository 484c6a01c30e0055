"""Device mesh + sharding helpers: the distributed backbone.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(`/root/reference/train/train_net_det.py:308-309`). The TPU-native equivalent
is SPMD data parallelism over a 1-D ``data`` mesh axis: parameters and
optimizer state are replicated, batches are sharded along axis 0, and XLA
inserts the gradient ``psum`` over ICI automatically from the sharding
annotations. Multi-host runs shard the input pipeline by
``jax.process_index()`` and need no further code changes.

The model is a few M parameters, so no tensor/pipeline axes are needed
(SURVEY.md §2.3); the mesh helper still accepts arbitrary shapes for
forward-compatibility.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              mesh_shape: Sequence[int] = (-1,),
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a device mesh; a -1 dim absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    known = int(np.prod([d for d in shape if d > 0])) if any(d > 0 for d in shape) else 1
    for i, d in enumerate(shape):
        if d == -1:
            shape[i] = len(devices) // known
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis (leading-axis prefix spec)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch axis sharded."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
