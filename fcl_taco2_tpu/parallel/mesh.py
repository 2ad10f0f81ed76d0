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


def chained_batch_shardings(mesh: Mesh) -> NamedSharding:
    """Sharding for a chain-stacked Batch (train/step.
    make_chained_train_step): leading axis = scan steps (unsharded),
    second axis = the batch axis, split over all mesh axes."""
    return NamedSharding(mesh, P(None, tuple(mesh.axis_names)))


def shard_chained_batch(mesh: Mesh, batch) -> Batch:
    """Host numpy chain-stacked Batch -> device arrays over the mesh."""
    if mesh.devices.size == 1:
        return put_batch_packed(mesh, batch)
    s = chained_batch_shardings(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


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
_H2D_POOL = None


def _h2d_pool():
    global _H2D_POOL
    if _H2D_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _H2D_POOL = ThreadPoolExecutor(max_workers=8,
                                       thread_name_prefix="h2d")
    return _H2D_POOL


def put_batch_packed(mesh: Mesh, batch, chunk_bytes=256 << 10) -> Batch:
    """Transfer a host numpy Batch as one packed byte buffer, split into
    ~``chunk_bytes`` chunks uploaded on CONCURRENT streams, + a jitted
    on-device unpack (concat + slice + bitcast + reshape per leaf).

    Single-device meshes only: packing collapses per-leaf transfer RPCs
    over a remote-device link into a few (each device_put costs ~2.5 ms
    of per-call overhead on the axon relay), and the chunk fan-out works
    around the relay's per-stream bandwidth cap the same way the D2H
    fetch does (utils/device.device_get_chunked_async: one stream
    ~16 MB/s, concurrent ~42 MB/s) — H2D was the binding constraint of
    the real loop at 37.6 ms/batch on one stream vs a 22.65 ms device
    step (results/TRAIN_loop.json, VERDICT r4 weak #3).  On pods the
    per-put overhead is negligible and the per-leaf path places shards
    directly.  Exact: bitcast round-trips bits, bool travels as uint8.
    One compile per (shapes, dtypes, n_chunks) combination — the
    converter's static buckets keep that set small.
    """
    import jax.numpy as jnp
    import numpy as _np
    from jax import lax

    leaves, treedef = jax.tree_util.tree_flatten(batch)
    metas = tuple((x.shape, _np.dtype(x.dtype).str) for x in leaves)
    host = [_np.ascontiguousarray(x).view(_np.uint8).reshape(-1)
            for x in leaves]
    packed = _np.concatenate(host)
    dev = mesh.devices.reshape(-1)[0]
    total = packed.nbytes
    n_chunks = max(1, min(16, -(-total // chunk_bytes)))
    bounds = [total * k // n_chunks for k in range(n_chunks + 1)]
    if n_chunks == 1:
        bufs = (jax.device_put(packed, dev),)
    else:
        futs = [_h2d_pool().submit(jax.device_put, packed[a:z], dev)
                for a, z in zip(bounds, bounds[1:])]
        bufs = tuple(f.result() for f in futs)

    key = (metas, n_chunks)
    unpack = _UNPACK_CACHE.get(key)
    if unpack is None:
        offs = _np.cumsum([0] + [h.nbytes for h in host]).tolist()

        def unpack_fn(*chunks):
            b = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
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

    return treedef.unflatten(unpack(*bufs))
