"""Host<->device transfer plumbing: the packed H2D batch put, the
chunked-concurrent D2H fetch, and the async checkpoint writer built on it.

These paths exist because of the remote-attached-TPU link profile
(per-transfer RPC overhead, single-stream D2H cap — see
utils/device.device_get_chunked_async); correctness must hold bit-exactly
on any backend, which is what CPU can verify.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.parallel.mesh import make_mesh, put_batch_packed
from fcl_taco2_tpu.train.checkpoint import (AsyncCheckpointWriter,
                                            fetch_host_state,
                                            restore_checkpoint,
                                            save_checkpoint)
from fcl_taco2_tpu.train.optim import build_optimizer
from fcl_taco2_tpu.train.state import TrainState
from fcl_taco2_tpu.train.step import make_train_step
from fcl_taco2_tpu.utils.device import (device_get_chunked,
                                        device_get_chunked_async)

from helpers import synthetic_batch, tiny_config


def _mixed_tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "f32": rng.normal(size=(37, 5)).astype(np.float32),
        "bf16": jnp.asarray(rng.normal(size=(9, 3)), jnp.bfloat16),
        "i32": rng.integers(-9, 9, (4, 4)).astype(np.int32),
        "bool": rng.integers(0, 2, (11,)).astype(bool),
        "u8": rng.integers(0, 255, (13,)).astype(np.uint8),
        "scalar": np.float32(3.25),
        "aux": "not-an-array",  # non-device leaf passes through untouched
    }


def _assert_tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        if isinstance(x, str):
            assert x == y
            continue
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype and x.shape == y.shape
        np.testing.assert_array_equal(
            x.view(np.uint8) if x.dtype == jnp.bfloat16 else x,
            y.view(np.uint8) if y.dtype == jnp.bfloat16 else y)


def test_device_get_chunked_roundtrip_bitexact():
    host = _mixed_tree()
    dev = {k: (jax.device_put(v) if not isinstance(v, str) else v)
           for k, v in host.items()}
    # tiny chunk size forces the multi-chunk path (>=2 chunks)
    out = device_get_chunked(dev, chunk_bytes=64)
    _assert_tree_equal(out, host)
    for k, v in out.items():
        if not isinstance(v, str):
            assert isinstance(v, np.ndarray) or np.isscalar(v) or \
                v.shape == ()


def test_device_get_chunked_async_survives_deletion():
    """The pack COPIES: the finisher must stay valid after the source
    buffers are deleted (the real hazard is a later donating train step
    reusing the state's memory)."""
    host = _mixed_tree(1)
    dev = {k: (jax.device_put(v) if not isinstance(v, str) else v)
           for k, v in host.items()}
    # device_put of an already-jax leaf can alias it: snapshot host values
    # BEFORE deletion so the comparison side survives
    host = {k: (v if isinstance(v, str) else np.asarray(v))
            for k, v in host.items()}
    finish = device_get_chunked_async(dev, chunk_bytes=64)
    for v in dev.values():
        if isinstance(v, jax.Array):
            v.delete()
    _assert_tree_equal(finish(), host)


def test_put_batch_packed_matches_device_put():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, B=2, Tmax=4, n_seg=8)
    # host-numpy leaves, as the converter hands the loop
    host = jax.tree_util.tree_map(np.asarray, batch)
    mesh = make_mesh(1)
    packed = put_batch_packed(mesh, host)
    _assert_tree_equal(
        jax.tree_util.tree_map(np.asarray, packed), host)
    for leaf in jax.tree_util.tree_leaves(packed):
        assert isinstance(leaf, jax.Array)


def _tiny_train_state(cfg):
    model = Tacotron2SA(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    tx = build_optimizer()
    return model, tx, TrainState(params, mstate, tx.init(params),
                                 jnp.int32(7))


def test_async_checkpoint_writer_matches_sync(tmp_path):
    cfg = tiny_config()
    _, _, ts = _tiny_train_state(cfg)

    sync_path = os.path.join(str(tmp_path), "sync.ckpt")
    save_checkpoint(sync_path, ts, epoch=3, best_val=1.5)

    w = AsyncCheckpointWriter()
    a_path = os.path.join(str(tmp_path), "async.ckpt")
    b_path = os.path.join(str(tmp_path), "async2.ckpt")
    w.submit(ts, [(a_path, 3, 1.5), (b_path, 4, 0.5)])
    w.wait()

    ref, ep_ref, bv_ref = restore_checkpoint(sync_path, ts)
    got, ep, bv = restore_checkpoint(a_path, ts)
    assert (ep, bv) == (ep_ref, bv_ref) == (3, 1.5)
    _assert_tree_equal(
        jax.tree_util.tree_map(np.asarray, got.params),
        jax.tree_util.tree_map(np.asarray, ref.params))
    got2, ep2, bv2 = restore_checkpoint(b_path, ts)
    assert (ep2, bv2) == (4, 0.5)
    assert int(got.step) == int(got2.step) == 7


def test_async_checkpoint_writer_nonblocking_coalesce(tmp_path,
                                                      monkeypatch):
    """While a job is in flight: droppable jobs skip, must-writes
    coalesce by path (newest state wins), and submit never blocks."""
    import threading
    import time

    from fcl_taco2_tpu.train import checkpoint as C

    cfg = tiny_config()
    _, _, ts = _tiny_train_state(cfg)
    gate = threading.Event()
    real = C.start_state_fetch
    calls = []

    def gated_fetch(train_state, opt_state_dtype=None):
        fin = real(train_state, opt_state_dtype=opt_state_dtype)
        first = not calls
        calls.append(1)

        def finish():
            if first:
                assert gate.wait(timeout=30), "test gate never opened"
            return fin()

        return finish

    monkeypatch.setattr(C, "start_state_fetch", gated_fetch)
    w = C.AsyncCheckpointWriter()
    snap1 = os.path.join(str(tmp_path), "snapshot.ep.1")
    snap2 = os.path.join(str(tmp_path), "snapshot.ep.2")
    best = os.path.join(str(tmp_path), "model.loss.best")
    t0 = time.perf_counter()
    assert w.submit(ts, [(snap1, 1, 2.0)])  # in flight, held by the gate
    # droppable periodic while busy -> skipped
    assert not w.submit(ts, [(snap2, 2, 2.0)], droppable=True)
    # two must-write bests while busy -> pending, newest supersedes
    assert w.submit(ts, [(best, 2, 1.5, True)])
    ts3 = TrainState(ts.params, ts.model_state, ts.opt_state,
                     jnp.int32(9))
    assert w.submit(ts3, [(best, 3, 1.0, True)])
    assert w.skipped == 1 and w.coalesced == 1
    assert time.perf_counter() - t0 < 10, "submit must not block"
    gate.set()
    w.wait()
    got, ep, bv = restore_checkpoint(best, ts)
    assert (ep, bv) == (3, 1.0)
    assert int(got.step) == 9, "coalesced best must hold the NEWEST state"
    assert os.path.exists(snap1)
    assert not os.path.exists(snap2), "droppable job must be skipped"


def test_async_checkpoint_writer_reraises(tmp_path):
    cfg = tiny_config()
    _, _, ts = _tiny_train_state(cfg)
    w = AsyncCheckpointWriter()
    bad = os.path.join(str(tmp_path), "file_not_dir")
    with open(bad, "w") as f:
        f.write("x")
    # path's parent is a FILE -> os.makedirs raises in the worker
    w.submit(ts, [(os.path.join(bad, "ckpt"), 1, None)])
    with pytest.raises(OSError):
        w.wait()
    w.wait()  # error is consumed; writer is reusable


def test_packed_report_matches_dict_report():
    """report_keys mode returns the SAME values as the dict report, as one
    (K,) f32 vector with deterministic key order."""
    cfg = tiny_config()
    model, tx, ts = _tiny_train_state(cfg)
    batch = synthetic_batch(cfg, B=2, Tmax=4, n_seg=8)
    rng = jax.random.PRNGKey(5)

    step_dict = make_train_step(model, tx, donate=False)
    keys = []
    step_vec = make_train_step(model, tx, donate=False, report_keys=keys)

    _, rep_d = step_dict(ts, batch, rng)
    _, rep_v = step_vec(ts, batch, rng)
    assert keys == sorted(rep_d)
    assert rep_v.shape == (len(keys),) and rep_v.dtype == jnp.float32
    for i, k in enumerate(keys):
        np.testing.assert_allclose(np.asarray(rep_v[i]),
                                   np.float32(rep_d[k]), rtol=1e-6)
