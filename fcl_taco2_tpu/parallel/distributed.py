"""Multi-host runtime: process bootstrap + global batch assembly.

The reference has NO distributed backend — its widest reach is
single-process torch.nn.DataParallel (/root/reference/tts.py:365-373,
SURVEY.md §2.3).  This module is the TPU-native extension past one host:
every host runs the same program (single-controller JAX),
``jax.distributed.initialize`` wires the processes together, and each host
feeds only its process-local shard of every batch —
``jax.make_array_from_process_local_data`` assembles the logically-global
arrays that the jitted train step consumes with GLOBAL semantics.  The
step function itself is unchanged: the same NamedShardings drive one chip,
one slice over ICI, or many slices over DCN (parallel/mesh.make_hybrid_mesh).
"""

from typing import Optional

import jax

from fcl_taco2_tpu.parallel.mesh import batch_shardings, shard_batch


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wire up multi-host JAX.  With no arguments, initialization is
    driven by the cluster environment (TPU metadata / JAX_COORDINATOR_*
    env vars); call once before any backend access.  No-op on a
    single-process run without a coordinator."""
    if coordinator_address is None and num_processes is None:
        import os
        if not (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS")):
            return  # plain single-process run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def make_global_batch(mesh, batch):
    """Globally-identical numpy Batch -> sharded global device arrays.

    Every host builds the SAME logical batch (the planner and converter
    are deterministic given the manifest + epoch seed, so this holds by
    construction); each device then pulls only its own slice.  This keeps
    the converter's cross-utterance segment plan (``seg_utt`` indexes the
    GLOBAL utterance axis) valid regardless of how processes own devices.

    Single-process: a plain device_put with the mesh sharding (fast path —
    no per-device callbacks).
    """
    if not is_multiprocess():
        return shard_batch(mesh, batch)
    sharding = batch_shardings(mesh)

    def leaf(x):
        if x is None:
            return None
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])
    return jax.tree_util.tree_map(leaf, batch)
