"""Device mesh + sharding layout for data-parallel training.

The reference's only distribution strategy is single-process
torch.nn.DataParallel (/root/reference/tts.py:365-373).  Here the TPU-native
equivalent (SURVEY.md §5.8): a 1-axis ``data`` mesh over ICI; the jitted
train step is written with GLOBAL semantics and NamedShardings — batch
arrays sharded on their leading axis, params/opt-state replicated — and XLA
inserts the gradient all-reduce and any gather the phoneme-segment indexing
needs.  n-device loss == 1-device loss by construction (tested in
tests/test_parallel.py).

The phoneme-segment axis (P) is itself data-parallel: segments are ordered
utterance-major (ops/regroup.build_plan), so sharding P alongside B keeps
decoder compute local; only the small (B, Tmax, C) encoder output crosses
shards in the worst case.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fcl_taco2_tpu.models.taco2_sa import Batch

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh) -> NamedSharding:
    """Sharding for Batch leaves: leading axis over ``data``.  Returned as
    a single sharding usable as a pytree PREFIX (optional fields like
    spembs may be None)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Batch) -> Batch:
    """Host numpy Batch -> device arrays laid out over the mesh."""
    s = batch_shardings(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
