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

Multi-host runs: call :func:`maybe_initialize_distributed` before any other
jax API (env-gated, a no-op when unset), shard the input pipeline by
``jax.process_index()`` (the loader does), and let :func:`shard_batch`
assemble the per-host shards into global arrays. Writes (checkpoints,
results, scalars) belong to process 0 — gate them with :func:`is_chief`.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DIST_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Env-gated ``jax.distributed.initialize`` — the multi-host bootstrap.

    The reference is single-machine; its entire distributed surface is
    ``torch.nn.DataParallel`` (`train/train_net_det.py:308-309`). The pod-
    scale upgrade needs one process per host joined into a global runtime:

    * ``FRUSTUM_COORDINATOR=host:port`` plus ``FRUSTUM_NUM_PROCESSES`` and
      ``FRUSTUM_PROCESS_ID`` → explicit initialize (CPU/GPU clusters, the
      2-process integration test);
    * ``FRUSTUM_DIST=auto`` → argless initialize (TPU pods: coordinator and
      process ids come from the TPU metadata / cluster scheduler).

    Must run before any jax API that instantiates the backend. Returns True
    when a multi-process runtime was (already) set up.
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return True
    coord = os.environ.get("FRUSTUM_COORDINATOR")
    auto = os.environ.get("FRUSTUM_DIST", "").lower() == "auto"
    if not coord and not auto:
        return False
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # cross-process collectives on the CPU backend need gloo (used by the
        # localhost integration test; TPU runs take the default ICI path)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["FRUSTUM_NUM_PROCESSES"]),
            process_id=int(os.environ["FRUSTUM_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    _DIST_INITIALIZED = True
    return True


def is_chief() -> bool:
    """True on the process that owns filesystem writes (checkpoints,
    result files, scalar logs) — all hosts compute, one host records."""
    return jax.process_index() == 0


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


def shard_full_batch(batch, mesh: Mesh):
    """Shard a pytree whose leaves every host holds IN FULL (inference path).

    The inference drivers keep host-side work identical on every process
    (deterministic loader, no process sharding) so detection post-processing
    needs no cross-host gather; the device work is still split over the whole
    mesh. Single-process: a plain sharded ``device_put``. Multi-process:
    ``jax.make_array_from_callback`` carves each addressable shard out of the
    full host copy (a host-local ``device_put`` would mis-declare the local
    copy as one shard).
    """
    s = data_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        # a LOCAL mesh inside a multi-process run is still fully addressable
        # (multi-host inference shards by batch, each host on its own chips)
        if s.is_fully_addressable:
            return jax.device_put(x, s)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, batch)


def allgather_detections(det_results: dict) -> dict:
    """Merge per-host detection dicts across processes (every host gets all).

    Multi-host inference is embarrassingly parallel: each host streams its
    ``batch_shard`` of the dataset through its local-mesh graph and this one
    collective merges the (small, compacted) detection dicts at the end —
    pickled to a padded uint8 buffer and all-gathered. Single-process: no-op.
    """
    if jax.process_count() == 1:
        return det_results
    import pickle

    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(det_results), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([blob.size], np.int64))  # (pc, 1)
    pad = np.zeros(int(sizes.max()), np.uint8)
    pad[:blob.size] = blob
    gathered = multihost_utils.process_allgather(pad)  # (pc, max_size)
    merged: dict = {}
    for i in range(gathered.shape[0]):
        d = pickle.loads(gathered[i, :int(sizes[i, 0])].tobytes())
        for idx, per_class in d.items():
            for cls, rows in per_class.items():
                merged.setdefault(idx, {}).setdefault(cls, []).extend(rows)
    return merged


def shard_batch(batch, mesh: Mesh):
    """Put a host batch pytree onto the mesh with the batch axis sharded.

    Single-process: a plain sharded ``device_put``. Multi-process: each
    host's batch is its *local shard* (the loader already split the global
    batch by ``jax.process_index()``), and
    ``jax.make_array_from_process_local_data`` assembles the shards into one
    global array — the host-local ``device_put`` would silently build a
    wrong (per-host) global batch.
    """
    s = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)
