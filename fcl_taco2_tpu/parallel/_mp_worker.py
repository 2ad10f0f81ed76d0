"""Multi-process worker: runs deterministic tiny workloads under
``jax.distributed`` so the REAL multi-process branches execute — not just
the single-process ``shard_batch`` short-circuits.

Modes (``--mode``), each certified by ``__graft_entry__.dryrun_multichip``
and ``tests/test_parallel.py`` against the same workload run
single-process in the parent interpreter:

- ``dp``       plain data-parallel training steps through
               ``make_global_batch``'s make_array_from_callback branch
- ``classed``  the duration-classed segment batches (the fcl_train
               DEFAULT --duration-classes path): the Batch pytree carries
               per-class SegClass plans of distinct shapes, exactly the
               layout data/converter.BatchConverter emits
- ``kd``       the knowledge-distillation step (frozen teacher fwd +
               student fwd/bwd in one jit, train/step.make_kd_train_step)
- ``serve``    sharded serving (infer/synth.Synthesizer over the global
               mesh: shard_map cores, replicated outputs)
- ``dp --save-ckpt`` / ``dp --resume-ckpt``  checkpoint continuity: save
               at step k in one 2-process run, restart a FRESH 2-process
               run from the file, losses must continue bitwise

The reference has no multi-host story at all (its widest reach is
single-process DataParallel, /root/reference/tts.py:365-373); this is the
TPU-native extension and its executable certification.
"""

import argparse
import json
import os
import re


def _tiny_cfg(**over):
    """Deterministic tiny model config shared by every mode (dropout and
    zoneout zeroed so single- and multi-process runs compare exactly)."""
    from fcl_taco2_tpu.models import ModelConfig

    base = dict(
        idim=11, odim=8, embed_dim=16, eunits=16, econv_layers=2,
        econv_chans=16, dunits=16, prenet_units=8, postnet_layers=3,
        postnet_chans=8, duration_predictor_chans=8,
        pitch_predictor_chans=8, energy_predictor_chans=8, max_dur=4,
        compute_dtype="float32", dropout_rate=0.0, zoneout_rate=0.0,
        duration_predictor_dropout_rate=0.0,
        pitch_predictor_dropout_rate=0.0,
        energy_predictor_dropout_rate=0.0,
        pitch_embed_dropout_rate=0.0, energy_embed_dropout_rate=0.0)
    base.update(over)
    return ModelConfig(**base)


def _tiny_batch(cfg, B=8, Tmax=4, classes=()):
    """Deterministic tiny numpy Batch; with ``classes``, the duration-
    classed plan layout the BatchConverter emits for the fcl_train default
    (data/converter.py:105-115 builds the identical SegClass tuple)."""
    import numpy as np

    from fcl_taco2_tpu.models.taco2_sa import Batch, SegClass
    from fcl_taco2_tpu.ops.regroup import (build_classed_plan, build_plan,
                                           duration_class_caps)

    rng = np.random.default_rng(0)
    durations = rng.integers(1, cfg.max_dur + 1, (B, Tmax)).astype(np.int32)
    olens = durations.sum(1).astype(np.int32)
    Lmax = int(olens.max())
    common = dict(
        tokens=rng.integers(1, cfg.idim, (B, Tmax)).astype(np.int32),
        ilens=np.full(B, Tmax, np.int32),
        mel=rng.normal(size=(B, Lmax, cfg.odim)).astype(np.float32),
        olens=olens, durations=durations,
        f0=rng.normal(size=(B, Tmax, 1)).astype(np.float32),
        energy=rng.normal(size=(B, Tmax, 1)).astype(np.float32))
    if classes:
        caps = duration_class_caps(list(durations), classes, B,
                                   cap_bucket=8)
        plan = build_classed_plan(durations, olens, classes, caps, Lmax)
        return Batch(
            seg_utt=None, seg_tok=None, seg_start=None, frame_mask=None,
            position=None, utt_gather=plan.utt_gather,
            utt_mask=plan.utt_mask,
            seg_classes=tuple(
                SegClass(c.seg_utt, c.seg_tok, c.seg_start, c.frame_mask,
                         c.position) for c in plan.classes),
            **common)
    plan = build_plan(durations, olens, cfg.max_dur, B * Tmax, Lmax)
    return Batch(
        seg_utt=plan.seg_utt, seg_tok=plan.seg_tok,
        seg_start=plan.seg_start, frame_mask=plan.frame_mask,
        position=plan.position, utt_gather=plan.utt_gather,
        utt_mask=plan.utt_mask, **common)


def _checksum(tree):
    import jax
    import numpy as np

    return float(sum(
        float(np.abs(np.asarray(leaf)).sum())
        for leaf in jax.tree_util.tree_leaves(tree)))


def run_training_steps(n_steps=3, classes=(), save_ckpt=None,
                       resume_ckpt=None, checksum_steps=()):
    """Deterministic tiny DP training workload over ALL global devices.

    Every process builds the same logical batch (numpy, fixed seed) and
    feeds it through ``make_global_batch``; returns the per-step loss
    list and a params checksum after the last step.  The per-step PRNG is
    keyed by the ABSOLUTE step index (``ts.step``), so a run resumed from
    ``resume_ckpt`` replays the exact key sequence an uninterrupted run
    would have used — the bitwise-continuity property the ckpt mode
    certifies.

    ``checksum_steps``: also record the params checksum after these step
    counts; the return grows a third element ``{step: checksum}``.  Lets
    ONE n-step run serve as the reference for both a k-step (k < n) pair
    and a resumed pair — the dryrun previously re-ran the identical
    2-step workload just for its checksum (ADVICE r4 #2).
    """
    import jax
    import numpy as np

    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.parallel.distributed import make_global_batch
    from fcl_taco2_tpu.parallel.mesh import make_mesh
    from fcl_taco2_tpu.train.checkpoint import (restore_checkpoint,
                                                save_checkpoint)
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState

    from fcl_taco2_tpu.train.step import make_train_step

    cfg = _tiny_cfg(duration_classes=classes)
    model = Tacotron2SA(cfg)
    mesh = make_mesh()  # all GLOBAL devices
    gbatch = make_global_batch(mesh, _tiny_batch(cfg, classes=classes))

    params, mstate = model.init(jax.random.PRNGKey(0))
    tx = build_optimizer(lr=1e-3, grad_clip=1.0)
    ts = TrainState(params, mstate, tx.init(params), np.int32(0))
    if resume_ckpt:
        ts, _, _ = restore_checkpoint(resume_ckpt, ts)
        if jax.process_count() > 1:
            # align the processes before the step compile: gloo gives a
            # peer 30 s to show up at each new collective context, and a
            # worker whose restore/compile runs long (cold cache, loaded
            # box) can overshoot that from pure skew — observed as
            # rendezvous timeouts in the dryrun's resume pair
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("fcl_resume_restored")
    step = make_train_step(model, tx, mesh, donate=False)
    losses = []
    mid_checksums = {}
    for i in range(n_steps):
        key = jax.random.PRNGKey(100 + int(ts.step))
        ts, report = step(ts, gbatch, key)
        losses.append(float(np.asarray(report["loss"])))
        if (i + 1) in checksum_steps:
            mid_checksums[i + 1] = _checksum(ts.params)
    if save_ckpt and jax.process_index() == 0:
        save_checkpoint(save_ckpt, ts, epoch=0)
    # params checksum: replicated leaves, identical across processes
    if checksum_steps:
        return losses, _checksum(ts.params), mid_checksums
    return losses, _checksum(ts.params)


def run_kd_steps(n_steps=3):
    """Tiny KD workload (frozen teacher + student distill step) over all
    global devices through make_global_batch; returns (losses, student
    params checksum).  Mirrors train/distill.KDTrainer's jitted step."""
    import jax
    import numpy as np

    from fcl_taco2_tpu.models.kd import KDStudent
    from fcl_taco2_tpu.parallel.distributed import make_global_batch
    from fcl_taco2_tpu.parallel.mesh import make_mesh
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState
    from fcl_taco2_tpu.train.step import make_kd_train_step

    scfg = _tiny_cfg()
    tcfg = _tiny_cfg(embed_dim=24, eunits=24, econv_chans=24, dunits=24)
    kd = KDStudent(scfg, tcfg)
    mesh = make_mesh()
    gbatch = make_global_batch(mesh, _tiny_batch(scfg))

    params, mstate = kd.init(jax.random.PRNGKey(0))
    t_params, t_state = kd.teacher.init(jax.random.PRNGKey(1))
    tx = build_optimizer(lr=1e-3, grad_clip=1.0)
    ts = TrainState(params, mstate, tx.init(params), np.int32(0))
    step = make_kd_train_step(kd, tx, mesh, donate=False)
    losses = []
    for i in range(n_steps):
        ts, report = step(ts, t_params, t_state, gbatch,
                          jax.random.PRNGKey(200 + i))
        losses.append(float(np.asarray(report["loss"])))
    return losses, _checksum(ts.params)


def run_serving(n_utts=None):
    """Sharded serving over all global devices: Synthesizer shard_map
    cores with replicated outputs (every process reads back the full
    mels).  Returns (per-utterance mel checksums, total frames)."""
    import jax
    import numpy as np

    from fcl_taco2_tpu.infer.synth import Synthesizer
    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    model = Tacotron2SA(cfg)
    mesh = make_mesh()
    n = mesh.devices.size if n_utts is None else n_utts
    params, state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(model, params, state, batch_size=mesh.devices.size,
                        mesh=mesh, tok_bucket=4, frame_bucket=16)
    rng = np.random.default_rng(3)
    toks = [rng.integers(1, cfg.idim, 4).astype(np.int32)
            for _ in range(n)]
    mels, stats = synth.synth_batch(toks, rng=jax.random.PRNGKey(5))
    sums = [float(np.abs(m).sum()) for m in mels]
    return sums, int(stats["total_frames"])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--mode",
                    choices=("dp", "classed", "kd", "serve", "all"),
                    default="dp",
                    help="'all' runs dp(+save-ckpt), classed, kd and serve "
                         "in ONE process pair — jax.distributed startup "
                         "and interpreter costs amortize across the four "
                         "certifications (the dryrun driver's budget)")
    ap.add_argument("--save-ckpt", type=str, default=None,
                    help="dp mode: save a checkpoint after the last step")
    ap.add_argument("--resume-ckpt", type=str, default=None,
                    help="dp mode: restore this checkpoint first")
    ap.add_argument("--out", type=str, default=None,
                    help="process 0 writes the result JSON here")
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

    # shared persistent compile cache (opt-in via env): a second worker
    # pair (e.g. the dryrun's checkpoint-resume pair) reuses the programs
    # the first pair compiled — same machine, same 2-process topology, so
    # the XLA:CPU AOT artifacts are directly loadable
    cache = os.environ.get("FCL_MP_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from fcl_taco2_tpu.parallel.distributed import initialize, is_multiprocess

    initialize(coordinator_address=f"127.0.0.1:{args.port}",
               num_processes=args.num_processes,
               process_id=args.process_id)
    assert is_multiprocess(), "distributed init did not take effect"
    assert len(jax.local_devices()) == args.local_devices
    assert len(jax.devices()) == args.local_devices * args.num_processes

    if args.mode == "all":
        dp_l, dp_sum = run_training_steps(args.steps,
                                          save_ckpt=args.save_ckpt)
        cl_l, cl_sum = run_training_steps(2, classes=(2, 4))
        kd_l, kd_sum = run_kd_steps(2)
        mel_sums, frames = run_serving()
        result = {"dp": {"losses": dp_l, "checksum": dp_sum},
                  "classed": {"losses": cl_l, "checksum": cl_sum},
                  "kd": {"losses": kd_l, "checksum": kd_sum},
                  "serve": {"mel_sums": mel_sums, "total_frames": frames}}
    elif args.mode in ("dp", "classed"):
        classes = (2, 4) if args.mode == "classed" else ()
        losses, checksum = run_training_steps(
            args.steps, classes=classes, save_ckpt=args.save_ckpt,
            resume_ckpt=args.resume_ckpt)
        result = {"losses": losses, "checksum": checksum}
    elif args.mode == "kd":
        losses, checksum = run_kd_steps(args.steps)
        result = {"losses": losses, "checksum": checksum}
    else:  # serve
        sums, frames = run_serving()
        result = {"mel_sums": sums, "total_frames": frames}
    result.update({"mode": args.mode,
                   "num_processes": args.num_processes,
                   "global_devices": len(jax.devices())})
    print(f"proc {args.process_id}: {json.dumps(result)}", flush=True)
    if args.process_id == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
