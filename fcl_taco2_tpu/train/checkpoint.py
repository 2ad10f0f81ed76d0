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
    after the fetch was pipelined).  At most one job is in flight.

    Drop-behind (VERDICT r4 weak #4): when epochs are SHORTER than one
    background fetch, blocking on the previous job re-serializes the loop
    (measured 52 s of every 57 s epoch at save_interval=1).  A
    ``droppable=True`` submit — periodic snapshots, never best/preempt/
    final — is SKIPPED while the previous job is still running; the next
    eligible epoch snapshots instead.  ``skipped`` counts them.

    ``wait`` re-raises the first background failure (draining and logging
    any others — a failed previous job otherwise surfaces at an unrelated
    later call) — call it before reading the files or returning from
    training.  ``last_bg`` holds the last finished job's wall/bytes/phase
    breakdown: {'total_s', 'fetch_s', 'serialize_s', 'write_s',
    'bytes', 'files'}.
    """

    def __init__(self, opt_state_dtype=None):
        import threading

        self._threading = threading
        self._thread = None
        self._err = []
        self._opt_state_dtype = opt_state_dtype
        self.skipped = 0       # droppable submits skipped (job in flight)
        self.last_bg = {}      # phase breakdown of the last finished job
        self.last_bg_s = 0.0   # background wall of the last finished job

    def submit(self, train_state: TrainState, jobs, droppable=False):
        """jobs: list of (path, epoch, best_val) written from ONE fetch.
        Returns False if skipped under the drop-behind policy."""
        import time

        if droppable and self._thread is not None \
                and self._thread.is_alive():
            self.skipped += 1
            return False
        self.wait()
        finish = start_state_fetch(train_state,
                                   opt_state_dtype=self._opt_state_dtype)
        jobs = list(jobs)

        def work():
            t0 = time.perf_counter()
            bg = {"files": len(jobs)}
            try:
                host = finish()
                t1 = time.perf_counter()
                bg["fetch_s"] = round(t1 - t0, 4)
                bg["bytes"] = int(sum(
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
                t2 = time.perf_counter()
                bg["serialize_s"] = round(t2 - t1, 4)
                for path, epoch, best_val in jobs:
                    key = (int(epoch), float("inf") if best_val is None
                           else float(best_val))
                    os.makedirs(os.path.dirname(path) or ".",
                                exist_ok=True)
                    tmp = path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(blobs[key])
                    os.replace(tmp, path)
                bg["write_s"] = round(time.perf_counter() - t2, 4)
            except BaseException as e:
                self._err.append(e)
            finally:
                bg["total_s"] = round(time.perf_counter() - t0, 4)
                self.last_bg = bg
                self.last_bg_s = bg["total_s"]

        self._thread = self._threading.Thread(target=work, daemon=True)
        self._thread.start()
        return True

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err:
            errs, self._err = list(self._err), []
            for e in errs[1:]:
                print("AsyncCheckpointWriter: additional background "
                      f"failure: {e!r}", flush=True)
            raise errs[0]


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
