"""Multi-process worker: runs the deterministic tiny training workload
under ``jax.distributed`` so the REAL multi-process branch of
``make_global_batch`` (jax.make_array_from_callback over non-addressable
meshes, distributed.py) executes — not just the single-process
``shard_batch`` short-circuit.

Used two ways:
- ``tests/test_parallel.py`` and ``__graft_entry__.dryrun_multichip``
  spawn ``python -m fcl_taco2_tpu.parallel._mp_worker --process-id i
  --num-processes 2 ...`` twice and compare process 0's recorded losses
  against ``run_training_steps`` executed in-process (single-process,
  same global device count) — the callback branch must reproduce the
  ``shard_batch`` path bit-for-tolerance.
- The workload function is importable so the single-process reference is
  BY CONSTRUCTION the same program.

The reference has no multi-host story at all (its widest reach is
single-process DataParallel, /root/reference/tts.py:365-373); this is the
TPU-native extension and its executable certification.
"""

import argparse
import json
import os
import re


def run_training_steps(n_steps=3):
    """Deterministic tiny DP training workload over ALL global devices.

    Every process builds the same logical batch (numpy, fixed seed) and
    feeds it through ``make_global_batch``; returns the per-step loss
    list and a params checksum after the last step.  Dropout/zoneout are
    zeroed so single- and multi-process runs are comparable to float
    tolerance.
    """
    import jax
    import numpy as np

    from fcl_taco2_tpu.models import ModelConfig, Tacotron2SA
    from fcl_taco2_tpu.models.taco2_sa import Batch
    from fcl_taco2_tpu.ops.regroup import build_plan
    from fcl_taco2_tpu.parallel.distributed import make_global_batch
    from fcl_taco2_tpu.parallel.mesh import make_mesh
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState
    from fcl_taco2_tpu.train.step import make_train_step

    cfg = ModelConfig(
        idim=11, odim=8, embed_dim=16, eunits=16, econv_layers=2,
        econv_chans=16, dunits=16, prenet_units=8, postnet_layers=3,
        postnet_chans=8, duration_predictor_chans=8,
        pitch_predictor_chans=8, energy_predictor_chans=8, max_dur=4,
        compute_dtype="float32", dropout_rate=0.0, zoneout_rate=0.0,
        duration_predictor_dropout_rate=0.0,
        pitch_predictor_dropout_rate=0.0,
        energy_predictor_dropout_rate=0.0,
        pitch_embed_dropout_rate=0.0, energy_embed_dropout_rate=0.0)
    model = Tacotron2SA(cfg)
    mesh = make_mesh()  # all GLOBAL devices

    B, Tmax = 8, 4
    rng = np.random.default_rng(0)
    durations = rng.integers(1, cfg.max_dur + 1, (B, Tmax)).astype(np.int32)
    olens = durations.sum(1).astype(np.int32)
    plan = build_plan(durations, olens, cfg.max_dur, B * Tmax,
                      int(olens.max()))
    batch = Batch(
        tokens=rng.integers(1, cfg.idim, (B, Tmax)).astype(np.int32),
        ilens=np.full(B, Tmax, np.int32),
        mel=rng.normal(size=(B, int(olens.max()), cfg.odim)).astype(
            np.float32),
        olens=olens, durations=durations,
        f0=rng.normal(size=(B, Tmax, 1)).astype(np.float32),
        energy=rng.normal(size=(B, Tmax, 1)).astype(np.float32),
        seg_utt=plan.seg_utt, seg_tok=plan.seg_tok,
        seg_start=plan.seg_start, frame_mask=plan.frame_mask,
        position=plan.position, utt_gather=plan.utt_gather,
        utt_mask=plan.utt_mask)
    gbatch = make_global_batch(mesh, batch)

    params, mstate = model.init(jax.random.PRNGKey(0))
    tx = build_optimizer(lr=1e-3, grad_clip=1.0)
    ts = TrainState(params, mstate, tx.init(params), np.int32(0))
    step = make_train_step(model, tx, mesh, donate=False)
    losses = []
    for i in range(n_steps):
        ts, report = step(ts, gbatch, jax.random.PRNGKey(100 + i))
        losses.append(float(np.asarray(report["loss"])))
    # params checksum: replicated leaves, identical across processes
    checksum = float(sum(
        float(np.abs(np.asarray(leaf)).sum())
        for leaf in jax.tree_util.tree_leaves(ts.params)))
    return losses, checksum


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", type=str, default=None,
                    help="process 0 writes {losses, checksum} JSON here")
    args = ap.parse_args(argv)

    # force <local-devices> virtual CPU devices for THIS process, replacing
    # any inherited count (the parent may run with a different one)
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{args.local_devices}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from fcl_taco2_tpu.parallel.distributed import initialize, is_multiprocess

    initialize(coordinator_address=f"127.0.0.1:{args.port}",
               num_processes=args.num_processes,
               process_id=args.process_id)
    assert is_multiprocess(), "distributed init did not take effect"
    assert len(jax.local_devices()) == args.local_devices
    assert len(jax.devices()) == args.local_devices * args.num_processes

    losses, checksum = run_training_steps(args.steps)
    print(f"proc {args.process_id}: losses={losses} "
          f"checksum={checksum:.6f}", flush=True)
    if args.process_id == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump({"losses": losses, "checksum": checksum,
                       "num_processes": args.num_processes,
                       "global_devices": len(jax.devices())}, f)


if __name__ == "__main__":
    main()
