"""Device/link warmup helpers.

On remote-attached TPUs (axon relay) the FIRST device->host readback in a
process lazily initializes the reverse transfer path and can stall for
minutes; every later readback is ~30ms.  Calling ``warmup_transfers()``
once at startup absorbs that cost outside any timed or user-visible
section.
"""

import numpy as np

_warmed = False


def device_put_via_jit(tree):
    """Transfer a host pytree via a jitted identity.

    Executable OUTPUT buffers take the fast path on remote-device links;
    raw jax.device_put literals can stall the relay for minutes (see
    warmup_transfers).  Use this for one-time transfers of params/state.
    """
    import jax

    return jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x, t))(tree)


def zeros_like_shapes(fn, *args):
    """Host-numpy zero templates matching fn's output pytree (for
    flax.serialization.from_state_dict restore targets)."""
    import jax

    shapes = jax.eval_shape(fn, *args)
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)


def warmup_transfers():
    global _warmed
    if _warmed:
        return
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda v: v + 1.0)(jnp.zeros((1,), jnp.float32))
    np.asarray(x)  # first D2H: slow once, never again
    _warmed = True


def device_get_pipelined(tree):
    """Pytree device->host fetch with all leaves' D2H copies started
    asynchronously BEFORE any is materialized.

    Plain ``jax.device_get``/``np.asarray`` walks leaves serially, paying
    the full link round-trip per leaf; on remote-attached TPUs (~30 ms
    RTT) a 200-leaf optimizer state costs minutes that way — measured as
    the dominant term of the real training loop (results/TRAIN_loop.json:
    117 s/epoch of checkpoint fetch before this helper existed).
    """
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for x in leaves:
        start = getattr(x, "copy_to_host_async", None)
        if start is not None:
            try:
                start()
            except Exception:
                pass  # non-array leaf or backend without async copy
    return treedef.unflatten([np.asarray(x) for x in leaves])


_CHUNK_PACK_CACHE = {}


def device_get_chunked(tree, chunk_bytes=4 << 20):
    """Large-pytree device->host fetch through equal-size concurrent
    streams — see ``device_get_chunked_async`` (this is its synchronous
    form)."""
    return device_get_chunked_async(tree, chunk_bytes)()


def device_get_chunked_async(tree, chunk_bytes=4 << 20):
    """Dispatch the on-device pack NOW; return a zero-arg finisher that
    completes the device->host fetch (safe to call from another thread).

    One jitted pack turns every leaf into bytes, concatenates, and slices
    into ~``chunk_bytes`` chunks; the finisher fetches all chunks in
    parallel and reassembles the leaves host-side.

    Why: the axon relay caps a SINGLE D2H stream at ~16 MB/s but
    concurrent streams parallelize to ~42 MB/s (measured, 1-4 MB chunks
    optimal; results/TRAIN_loop.json d2h_probe).  A checkpoint-sized state
    (~400 MB) has a few dominant 16-33 MB leaves that serialize on the
    per-stream cap under ``device_get_pipelined``; equal chunks keep every
    stream busy to the end.  The pack also COPIES: the chunks are fresh
    buffers, so the fetch stays valid after the caller's original tree is
    donated to a later train step — the split into dispatch-now /
    fetch-later is exactly what lets checkpoint.AsyncCheckpointWriter
    overlap the fetch with the next epoch's compute (the pack is ordered
    on the device stream BEFORE any subsequent donating step).

    One compile per tree structure (cached); use only on trees with a
    stable structure across calls — for ragged lists of small leaves use
    ``device_get_pipelined``.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    meta = []          # (is_device, shape, dtype, nbytes)
    dev_idx = []
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array):
            meta.append((True, x.shape, np.dtype(x.dtype),
                         int(np.prod(x.shape, dtype=np.int64))
                         * np.dtype(x.dtype).itemsize))
            dev_idx.append(i)
        else:
            meta.append((False, None, None, 0))
    if not dev_idx:
        return lambda: treedef.unflatten(leaves)

    shapes = tuple((leaves[i].shape, np.dtype(leaves[i].dtype).str)
                   for i in dev_idx)
    total = sum(meta[i][3] for i in dev_idx)
    n_chunks = max(1, min(64, -(-total // chunk_bytes)))
    key = (shapes, n_chunks)
    pack = _CHUNK_PACK_CACHE.get(key)
    if pack is None:
        bounds = [total * k // n_chunks for k in range(n_chunks + 1)]

        def pack_fn(*arrs):
            def as_bytes(x):
                if x.dtype == jnp.bool_:
                    x = x.astype(jnp.uint8)
                if x.dtype.itemsize == 1:
                    return x.reshape(-1)
                return lax.bitcast_convert_type(
                    x.reshape(-1), jnp.uint8).reshape(-1)

            flat = jnp.concatenate([as_bytes(x) for x in arrs])
            return tuple(flat[a:b] for a, b in zip(bounds, bounds[1:]))

        pack = jax.jit(pack_fn)
        _CHUNK_PACK_CACHE[key] = pack

    chunks = pack(*[leaves[i] for i in dev_idx])

    def finish():
        for c in chunks:
            try:
                c.copy_to_host_async()
            except Exception:
                pass
        buf = np.concatenate([np.asarray(c) for c in chunks])
        out, off = list(leaves), 0
        for i in dev_idx:
            _, shape, dtype, nbytes = meta[i]
            raw = buf[off:off + nbytes]
            off += nbytes
            if dtype == np.bool_:
                out[i] = raw.astype(np.bool_).reshape(shape)
            else:
                out[i] = raw.view(dtype).reshape(shape)
        return treedef.unflatten(out)

    return finish
