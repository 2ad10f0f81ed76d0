#!/usr/bin/env python3
"""KD train-step cost envelope on the real TPU (VERDICT r2 next #5,
SURVEY hard part #6: the teacher knowledge is ~18 tensors at bucketed
shapes, /root/reference/nets/modules/decoder_sa_kd.py:702 — what does
carrying it cost?).

Measures the one-jit KD step (teacher fwd + student fwd/bwd/update,
train/step.make_kd_train_step) at reference shapes (96 phonemes/utt,
mean dur 8): step ms (chained fori_loop protocol, readback-forced) and
peak HBM, for B in {16, 32, 64, ...} with and without remat_decoder.
Each (B, remat) config runs in its OWN subprocess so peak_bytes_in_use
is per-config, not cumulative.  Records results/KD_envelope.json; the
CLI batch-size guidance cites it.

Usage: python scripts/bench_kd.py [--reps 10] [--out results/...]
       (internal: --one B REMAT prints a single JSON row)
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PHONES = 96
MEAN_DUR = 8


def run_one(B, remat, reps, classes=()):
    import jax
    import jax.numpy as jnp

    from fcl_taco2_tpu.models.config import student_config, teacher_config
    from fcl_taco2_tpu.models.kd import KDStudent
    from fcl_taco2_tpu.models.taco2_sa import Batch
    from fcl_taco2_tpu.ops.regroup import build_plan
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState
    from fcl_taco2_tpu.train.step import make_kd_train_step
    from fcl_taco2_tpu.utils.device import warmup_transfers

    warmup_transfers()
    scfg = student_config(idim=70, remat_decoder=remat,
                          duration_classes=classes)
    tcfg = teacher_config(idim=70, remat_decoder=remat,
                          duration_classes=classes)
    kd = KDStudent(scfg, tcfg)

    rng = np.random.default_rng(0)
    Tmax = N_PHONES
    durations = np.clip(rng.poisson(MEAN_DUR, (B, Tmax)), 1,
                        scfg.max_dur).astype(np.int32)
    olens = durations.sum(1).astype(np.int32)
    Lmax = int(np.ceil(olens.max() / 64) * 64)
    plan = build_plan(durations, olens, scfg.max_dur, B * Tmax, Lmax)
    seg_fields = dict(
        seg_utt=plan.seg_utt, seg_tok=plan.seg_tok,
        seg_start=plan.seg_start, frame_mask=plan.frame_mask,
        position=plan.position, utt_gather=plan.utt_gather,
        utt_mask=plan.utt_mask)
    if classes:
        from fcl_taco2_tpu.models.taco2_sa import SegClass
        from fcl_taco2_tpu.ops.regroup import (build_classed_plan,
                                               duration_class_caps)
        eff = scfg.effective_duration_classes
        caps = duration_class_caps(list(durations), eff, B, cap_bucket=64)
        cplan = build_classed_plan(durations, olens, eff, caps, Lmax)
        seg_fields = dict(
            seg_utt=None, seg_tok=None, seg_start=None, frame_mask=None,
            position=None, utt_gather=cplan.utt_gather,
            utt_mask=cplan.utt_mask,
            seg_classes=tuple(
                SegClass(c.seg_utt, c.seg_tok, c.seg_start, c.frame_mask,
                         c.position) for c in cplan.classes))
    batch = Batch(
        tokens=rng.integers(1, 70, (B, Tmax)).astype(np.int32),
        ilens=np.full(B, Tmax, np.int32),
        mel=rng.normal(size=(B, Lmax, scfg.odim)).astype(np.float32),
        olens=olens, durations=durations,
        f0=rng.normal(size=(B, Tmax, 1)).astype(np.float32),
        energy=rng.normal(size=(B, Tmax, 1)).astype(np.float32),
        **seg_fields)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    params, mstate = jax.jit(kd.init)(jax.random.PRNGKey(0))
    t_params, t_state = jax.jit(kd.teacher.init)(jax.random.PRNGKey(1))
    tx = build_optimizer()
    ts = TrainState(params, mstate, tx.init(params), np.int32(0))
    step_raw = make_kd_train_step(kd, tx, mesh=None, donate=False)

    n = reps
    key = jax.random.PRNGKey(2)

    @jax.jit
    def steps_loop(ts, key):
        def body(i, carry):
            ts, _ = carry
            ts2, report = step_raw(ts, t_params, t_state, batch,
                                   jax.random.fold_in(key, i))
            return (ts2, report["loss"])
        return jax.lax.fori_loop(0, n, body, (ts, jnp.float32(0.0)))

    compiled = steps_loop.lower(ts, key).compile()
    # runtime memory_stats() is unavailable over the axon relay, so
    # account HBM from the compiled executable instead: arguments +
    # outputs + XLA temp (the scratch high-water mark).
    try:
        ma = compiled.memory_analysis()
        hbm = (ma.argument_size_in_bytes + ma.output_size_in_bytes
               + ma.temp_size_in_bytes)
        hbm_detail = {
            "args_gb": round(ma.argument_size_in_bytes / 2 ** 30, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 2 ** 30, 3),
        }
    except Exception:
        hbm, hbm_detail = None, None

    out = compiled(ts, key)
    loss0 = float(np.asarray(out[1]))  # warm + force
    t0 = time.perf_counter()
    np.asarray(out[1])
    rtt = time.perf_counter() - t0
    per = []
    for r in range(3):
        t0 = time.perf_counter()
        np.asarray(compiled(ts, jax.random.fold_in(key, 1000 + r))[1])
        per.append(max(time.perf_counter() - t0 - rtt, 1e-9) / n)
    return {
        "B": B, "remat_decoder": remat,
        "duration_classes": list(classes),
        "P": len(plan.seg_utt),
        "Lmax": Lmax, "step_ms": round(float(np.median(per)) * 1e3, 2),
        "frames_per_sec": round(int(olens.sum()) / float(np.median(per)), 1),
        "peak_hbm_gb": round(hbm / 2 ** 30, 3) if hbm is not None else None,
        "hbm_detail": hbm_detail,
        "loss_finite": bool(np.isfinite(loss0)),
    }


def _make_batch(B, cfg, classes):
    """The run_one batch builder, shared with the breakdown mode."""
    import jax
    import jax.numpy as jnp

    from fcl_taco2_tpu.models.taco2_sa import Batch
    from fcl_taco2_tpu.ops.regroup import build_plan

    rng = np.random.default_rng(0)
    Tmax = N_PHONES
    durations = np.clip(rng.poisson(MEAN_DUR, (B, Tmax)), 1,
                        cfg.max_dur).astype(np.int32)
    olens = durations.sum(1).astype(np.int32)
    Lmax = int(np.ceil(olens.max() / 64) * 64)
    plan = build_plan(durations, olens, cfg.max_dur, B * Tmax, Lmax)
    seg_fields = dict(
        seg_utt=plan.seg_utt, seg_tok=plan.seg_tok,
        seg_start=plan.seg_start, frame_mask=plan.frame_mask,
        position=plan.position, utt_gather=plan.utt_gather,
        utt_mask=plan.utt_mask)
    if classes:
        from fcl_taco2_tpu.models.taco2_sa import SegClass
        from fcl_taco2_tpu.ops.regroup import (build_classed_plan,
                                               duration_class_caps)
        eff = cfg.effective_duration_classes
        caps = duration_class_caps(list(durations), eff, B, cap_bucket=64)
        cplan = build_classed_plan(durations, olens, eff, caps, Lmax)
        seg_fields = dict(
            seg_utt=None, seg_tok=None, seg_start=None, frame_mask=None,
            position=None, utt_gather=cplan.utt_gather,
            utt_mask=cplan.utt_mask,
            seg_classes=tuple(
                SegClass(c.seg_utt, c.seg_tok, c.seg_start, c.frame_mask,
                         c.position) for c in cplan.classes))
    batch = Batch(
        tokens=rng.integers(1, 70, (B, Tmax)).astype(np.int32),
        ilens=np.full(B, Tmax, np.int32),
        mel=rng.normal(size=(B, Lmax, cfg.odim)).astype(np.float32),
        olens=olens, durations=durations,
        f0=rng.normal(size=(B, Tmax, 1)).astype(np.float32),
        energy=rng.normal(size=(B, Tmax, 1)).astype(np.float32),
        **seg_fields)
    return jax.tree_util.tree_map(jnp.asarray, batch), olens


def breakdown_one(B, reps, classes=()):
    """Split the KD step wall into teacher-fwd / full-loss-fwd / step
    (VERDICT r03 #3): each piece is its own chained fori_loop, so
    student-fwd = loss_fwd - teacher_fwd and student-bwd+update =
    step - loss_fwd are attributable by subtraction."""
    import jax
    import jax.numpy as jnp

    from fcl_taco2_tpu.models.config import student_config, teacher_config
    from fcl_taco2_tpu.models.kd import KDStudent
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState
    from fcl_taco2_tpu.train.step import make_kd_train_step
    from fcl_taco2_tpu.utils.device import warmup_transfers

    warmup_transfers()
    # remat=True: the KD default (fcl_train.py)
    scfg = student_config(idim=70, remat_decoder=True,
                          duration_classes=classes)
    tcfg = teacher_config(idim=70, remat_decoder=True,
                          duration_classes=classes)
    kd = KDStudent(scfg, tcfg)
    batch, olens = _make_batch(B, scfg, classes)

    params, mstate = jax.jit(kd.init)(jax.random.PRNGKey(0))
    t_params, t_state = jax.jit(kd.teacher.init)(jax.random.PRNGKey(1))
    tx = build_optimizer()
    ts = TrainState(params, mstate, tx.init(params), np.int32(0))
    step_raw = make_kd_train_step(kd, tx, mesh=None, donate=False)
    n = reps

    def timed(loop_fn):
        f = jax.jit(loop_fn)
        out = f(jax.random.PRNGKey(2))
        np.asarray(out)  # compile + warm
        t0 = time.perf_counter()
        np.asarray(out)
        rtt = time.perf_counter() - t0
        per = []
        for r in range(3):
            t0 = time.perf_counter()
            np.asarray(f(jax.random.fold_in(jax.random.PRNGKey(2), r)))
            per.append(max(time.perf_counter() - t0 - rtt, 1e-9) / n)
        return round(float(np.median(per)) * 1e3, 2)

    def teacher_loop(key):
        def body(i, acc):
            _, (_, _, know) = kd.teacher.loss_fn(
                t_params, t_state, batch, jax.random.fold_in(key, i),
                train=True, capture_kd=True)
            # force every knowledge tensor (what the KD step consumes)
            return acc + sum(jnp.sum(v.astype(jnp.float32))
                             for v in jax.tree_util.tree_leaves(know))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def loss_fwd_loop(key):
        def body(i, acc):
            loss, _ = kd.loss_fn(params, mstate, t_params, t_state, batch,
                                 jax.random.fold_in(key, i), train=True)
            return acc + loss
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def step_loop(key):
        def body(i, carry):
            ts, _ = carry
            ts2, report = step_raw(ts, t_params, t_state, batch,
                                   jax.random.fold_in(key, i))
            return (ts2, report["loss"])
        return jax.lax.fori_loop(0, n, body, (ts, jnp.float32(0.0)))[1]

    teacher_ms = timed(teacher_loop)
    loss_fwd_ms = timed(loss_fwd_loop)
    step_ms = timed(step_loop)
    return {
        "B": B, "duration_classes": list(classes),
        "teacher_fwd_ms": teacher_ms,
        "loss_fwd_ms": loss_fwd_ms,
        "step_ms": step_ms,
        "derived_student_fwd_ms": round(loss_fwd_ms - teacher_ms, 2),
        "derived_student_bwd_update_ms": round(step_ms - loss_fwd_ms, 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--one", nargs=3, metavar=("B", "REMAT", "CLASSES"),
                    default=None)
    ap.add_argument("--one-breakdown", nargs=2, metavar=("B", "CLASSES"),
                    default=None)
    ap.add_argument("--max-b", type=int, default=128)
    ap.add_argument("--out", type=str, default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "KD_envelope.json"))
    args = ap.parse_args(argv)

    if args.one:
        B, remat = int(args.one[0]), args.one[1] == "True"
        classes = tuple(int(x) for x in args.one[2].split(",")
                        if x.strip()) if args.one[2] != "-" else ()
        print("ROW " + json.dumps(run_one(B, remat, args.reps, classes)),
              flush=True)
        return
    if args.one_breakdown:
        B = int(args.one_breakdown[0])
        classes = tuple(int(x) for x in args.one_breakdown[1].split(",")
                        if x.strip()) if args.one_breakdown[1] != "-" else ()
        print("ROW " + json.dumps(breakdown_one(B, args.reps, classes)),
              flush=True)
        return

    rows = []
    for classes in ("-", "8,16,32"):
      for remat in (False, True):
        B = 16
        while B <= args.max_b:
            cmd = [sys.executable, os.path.abspath(__file__), "--one",
                   str(B), str(remat), classes, "--reps", str(args.reps)]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=1800)
            row_lines = [ln for ln in r.stdout.splitlines()
                         if ln.startswith("ROW ")]
            if r.returncode != 0 or not row_lines:
                err = (r.stdout + r.stderr)[-400:]
                rows.append({"B": B, "remat_decoder": remat,
                             "duration_classes": classes,
                             "status": "OOM/FAILED", "detail": err})
                print(f"B={B} remat={remat} classes={classes}: FAILED",
                      flush=True)
                break  # larger B will not fit either
            row = json.loads(row_lines[-1][4:])
            rows.append(row)
            print(json.dumps(row), flush=True)
            B *= 2

    breakdown = []
    for classes in ("-", "8,16,32"):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--one-breakdown", "16", classes, "--reps", str(args.reps)]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=1800)
        row_lines = [ln for ln in r.stdout.splitlines()
                     if ln.startswith("ROW ")]
        if row_lines:
            breakdown.append(json.loads(row_lines[-1][4:]))
            print(json.dumps(breakdown[-1]), flush=True)
        else:
            breakdown.append({"duration_classes": classes,
                              "status": "FAILED",
                              "detail": (r.stdout + r.stderr)[-400:]})

    import jax
    payload = {
        "protocol": {
            "what": "one-jit KD step (teacher fwd + student fwd/bwd/"
                    "update) at 96 phonemes/utt, mean dur 8; chained "
                    "fori_loop of --reps steps, median of 3 loop calls, "
                    "readback-forced; peak HBM = compiled-executable "
                    "memory_analysis (args+outputs+temp) per (B, remat) "
                    "in a fresh subprocess (runtime memory_stats is "
                    "unavailable over the axon relay)",
            "breakdown": "teacher-fwd / loss-fwd / full-step each its own "
                         "chained loop at B=16, remat (the KD default); "
                         "student-fwd and student-bwd+update derived by "
                         "subtraction",
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
        "rows": rows,
        "kd_breakdown_b16": breakdown,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
