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

DATA_AXIS = "data"      # fast axis: intra-slice ICI
REPLICA_AXIS = "replica"  # slow axis: cross-slice DCN (multi-slice/-host)


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_hybrid_mesh(n_slices: int,
                     devices_per_slice: Optional[int] = None,
                     devices: Optional[Sequence] = None) -> Mesh:
    """2-axis (replica=DCN, data=ICI) mesh for multi-slice / multi-host DP.

    Both axes carry the batch (see ``batch_shardings``); the gradient
    all-reduce XLA inserts is hierarchical — reduce inside each slice over
    ICI first, then the small cross-slice sum rides DCN.  On real multi-
    slice hardware the device order comes from
    ``mesh_utils.create_hybrid_device_mesh`` so the inner axis is
    guaranteed ICI-contiguous; on a flat backend (CPU tests, one slice)
    we reshape the device list directly.
    """
    if devices is None:
        devices = jax.devices()
    if devices_per_slice is None:
        if len(devices) % n_slices:
            raise ValueError(f"{len(devices)} devices not divisible into "
                             f"{n_slices} slices")
        devices_per_slice = len(devices) // n_slices
    n_total = n_slices * devices_per_slice
    if len(devices) < n_total:
        raise ValueError(f"need {n_total} devices, have {len(devices)}")
    has_slice_topology = any(
        getattr(d, "slice_index", None) is not None
        for d in devices[:n_total])
    if has_slice_topology:
        # real multi-slice TPU: honor ICI/DCN topology.  A failure here is
        # NOT silently papered over — a flat reshape on real multi-slice
        # hardware could put the 'data' axis across DCN, a large perf
        # cliff with no signal.
        from jax.experimental import mesh_utils
        dev_grid = mesh_utils.create_hybrid_device_mesh(
            (devices_per_slice,), (n_slices,), devices=devices[:n_total])
        # create_hybrid_device_mesh puts the DCN axis FIRST
        dev_grid = dev_grid.reshape(n_slices, devices_per_slice)
    else:  # single-slice / CPU backend: flat reshape is topology-exact
        if devices[0].platform == "tpu" and n_slices > 1:
            import warnings
            warnings.warn(
                "make_hybrid_mesh: TPU backend reports no slice topology "
                "(device.slice_index missing); using a flat device reshape "
                "— verify the 'data' axis stays ICI-contiguous")
        dev_grid = np.asarray(devices[:n_total]).reshape(
            n_slices, devices_per_slice)
    return Mesh(dev_grid, (REPLICA_AXIS, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh) -> NamedSharding:
    """Sharding for Batch leaves: leading axis split over ALL mesh axes
    (flattened DP — works for the 1-axis ICI mesh and the 2-axis
    replica×data hybrid alike).  Returned as a single sharding usable as
    a pytree PREFIX (optional fields like spembs may be None)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def shard_batch(mesh: Mesh, batch: Batch) -> Batch:
    """Host numpy Batch -> device arrays laid out over the mesh."""
    if mesh.devices.size == 1:
        # single chip: one packed transfer instead of ~15 per-leaf RPCs —
        # each device_put costs ~2.5 ms of per-call overhead on
        # remote-attached TPUs, which made the prefetch worker slower
        # than the 23 ms train step (results/TRAIN_loop.json loader_wait)
        return put_batch_packed(mesh, batch)
    s = batch_shardings(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


_UNPACK_CACHE = {}


def put_batch_packed(mesh: Mesh, batch) -> Batch:
    """Transfer a host numpy Batch as ONE byte buffer + a jitted on-device
    unpack (slice + bitcast + reshape per leaf).

    Single-device meshes only: the win is collapsing per-leaf transfer
    RPCs over a remote-device link into one; on pods the per-put overhead
    is negligible and the per-leaf path places shards directly.  Exact:
    bitcast round-trips bits, bool travels as uint8.  One compile per
    (shapes, dtypes) combination — the converter's static buckets keep
    that set small.
    """
    import jax.numpy as jnp
    import numpy as _np
    from jax import lax

    leaves, treedef = jax.tree_util.tree_flatten(batch)
    metas = tuple((x.shape, _np.dtype(x.dtype).str) for x in leaves)
    host = [_np.ascontiguousarray(x).view(_np.uint8).reshape(-1)
            for x in leaves]
    buf = jax.device_put(_np.concatenate(host),
                         mesh.devices.reshape(-1)[0])

    key = metas
    unpack = _UNPACK_CACHE.get(key)
    if unpack is None:
        offs = _np.cumsum([0] + [h.nbytes for h in host]).tolist()

        def unpack_fn(b):
            out = []
            for (shape, dtype), a, z in zip(metas, offs, offs[1:]):
                raw = b[a:z]
                dt = _np.dtype(dtype)
                if dt == _np.bool_:
                    out.append(raw.astype(jnp.bool_).reshape(shape))
                elif dt.itemsize == 1:
                    out.append(lax.bitcast_convert_type(
                        raw, jnp.dtype(dt)).reshape(shape))
                else:
                    out.append(lax.bitcast_convert_type(
                        raw.reshape(-1, dt.itemsize),
                        jnp.dtype(dt)).reshape(shape))
            return tuple(out)

        unpack = jax.jit(unpack_fn)
        _UNPACK_CACHE[key] = unpack

    return treedef.unflatten(unpack(buf))
