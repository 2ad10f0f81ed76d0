#!/usr/bin/env python3
"""Benchmark the AR decoder hot loop on the real TPU: XLA lax.scan vs the
fused Pallas kernel, fp32 vs bf16, student AND teacher.

SURVEY.md §7 item 8: keep the kernel only where it measurably beats the
XLA scan.  VERDICT r1 weak #6 asked for recorded teacher numbers: the
teacher's decoder weights are ~61 MB fp32 / ~31 MB bf16 — past the ~16 MB
VMEM ceiling — so the fused kernel (which wins by keeping weights RESIDENT
across all D steps) cannot apply; the teacher's lever is bf16 compute
(halved HBM weight traffic per step).  This script measures all variants
and records the result (including the negative one) to
results/PALLAS_decoder.json.

Usage: python scripts/bench_pallas.py [--reps 30] [--out results/...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models.config import student_config, teacher_config
from fcl_taco2_tpu.models.decoder import decoder_inference, decoder_init
from fcl_taco2_tpu.ops.decoder_pallas import (fits_vmem, fused_ar_decode,
                                              vmem_bytes_estimate)
from fcl_taco2_tpu.utils.device import warmup_transfers


def _inputs(cfg, P, seed=0):
    D = cfg.max_dur
    rng = np.random.default_rng(seed)
    enc_seg = jnp.asarray(
        rng.normal(size=(P, cfg.dec_idim)).astype(np.float32))
    dur = np.clip(rng.poisson(8, P), 1, D).astype(np.int32)
    frame_mask = jnp.asarray(np.arange(D)[None, :] < dur[:, None])
    position = jnp.asarray(np.where(
        np.asarray(frame_mask),
        np.arange(D)[None, :] / np.maximum(dur[:, None], 1),
        0.0).astype(np.float32))
    return enc_seg, jnp.asarray(dur), position, frame_mask


def _time_injit(fn_of_i, n, reps=3):
    """Median per-iteration time of an IN-JIT chained loop of ``fn_of_i``.

    Protocol (v3):
    - The decoder hot loop is 2-5 ms of device work; per-call dispatch
      over a remote-attached device adds comparable RTT jitter, so
      host-loop timing is noise-dominated.  Looping inside one compiled
      program makes the measurement RTT-free; completion is forced by a
      REAL host readback (jax.block_until_ready can return early over
      the relay) with the readback RTT subtracted.
    - ``fn_of_i(i, eps)`` must add the traced scalar ``eps`` to its DATA
      input (not just the PRNG seed): eps is always 0.0 but data-depends
      on iteration i-1's output, so XLA's loop-invariant code motion
      cannot hoist input-dependent work (e.g. the decoder's hoisted
      enc_seg projections) out of the timing loop — exactly the work
      that re-runs per batch in real serving/training.
    """

    @jax.jit
    def loop():
        def body(i, eps):
            out = fn_of_i(i, eps)
            # always 0.0, but XLA cannot prove it (x*0 is NaN-preserving)
            return jnp.ravel(out)[0].astype(jnp.float32) * 0.0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    out = loop()
    np.asarray(out)  # compile + warm
    t0 = time.perf_counter()
    np.asarray(out)
    rtt = time.perf_counter() - t0
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop())
        per.append(max(time.perf_counter() - t0 - rtt, 1e-9) / n)
    return float(np.median(per))


def bench_model(cfg, name, P, n, dropout=0.5):
    params, state = jax.jit(
        lambda k: decoder_init(k, cfg))(jax.random.PRNGKey(0))
    enc_seg, dur, position, frame_mask = _inputs(cfg, P)
    key = jax.random.PRNGKey(1)
    row = {"model": name, "P": P, "D": cfg.max_dur,
           "vmem_need_mb_fp32": round(vmem_bytes_estimate(cfg) / 2 ** 20, 1),
           "fits_vmem_fp32": bool(fits_vmem(cfg)),
           "fits_vmem_bf16": bool(fits_vmem(cfg,
                                            weights_dtype=jnp.bfloat16))}

    def cast(tree, dt):
        return jax.tree_util.tree_map(lambda x: x.astype(dt), tree)

    # --- XLA scan, fp32 and bf16 compute (the synthesize compute_dtype
    # policy: params + activations in bf16, fp32 accumulation on the MXU)
    for dt, tag in ((jnp.float32, "scan_fp32_ms"),
                    (jnp.bfloat16, "scan_bf16_ms")):
        # the compute_dtype policy casts params AND float inputs (position
        # included — a fp32 leak would promote the scan carry)
        p, e, pos = cast(params, dt), enc_seg.astype(dt), \
            position.astype(dt)
        row[tag] = _time_injit(
            lambda i, eps, _p=p, _e=e, _pos=pos: decoder_inference(
                _p, state, cfg, _e + eps.astype(_e.dtype), dur, _pos,
                frame_mask, jax.random.fold_in(key, i)), n) * 1e3

    # --- fused Pallas kernel (only where weights fit in VMEM)
    for wdt, tag in ((jnp.float32, "fused_fp32_ms"),
                     (jnp.bfloat16, "fused_bf16_ms")):
        if not fits_vmem(cfg, weights_dtype=wdt):
            row[tag] = None
            continue
        try:
            row[tag] = _time_injit(
                lambda i, eps, _w=wdt: fused_ar_decode(
                    params, enc_seg + eps, position, i,
                    zoneout=cfg.zoneout_rate, dropout=dropout,
                    weights_dtype=_w), n) * 1e3
        except Exception as exc:  # record compile failures, don't die
            row[tag] = f"FAILED: {type(exc).__name__}"

    # --- HBM weight-streaming kernel (the teacher path: weights > VMEM)
    from fcl_taco2_tpu.ops.decoder_pallas import (fused_ar_decode_hbm,
                                                  hbm_stream_compatible)
    for wdt, tag in ((jnp.bfloat16, "hbm_stream_bf16_ms"),
                     (jnp.float32, "hbm_stream_fp32_ms"),
                     (jnp.int8, "hbm_stream_int8_ms")):
        if not hbm_stream_compatible(cfg):
            row[tag] = None
            continue
        try:
            row[tag] = _time_injit(
                lambda i, eps, _w=wdt: fused_ar_decode_hbm(
                    params, enc_seg + eps, position, i,
                    zoneout=cfg.zoneout_rate, dropout=dropout,
                    weights_dtype=_w), n) * 1e3
        except Exception as exc:
            row[tag] = f"FAILED: {type(exc).__name__}"

    # --- duration-bounded RAGGED variants (synthesize ragged_decode):
    # segments sorted by duration descending, per-tile bounds for the
    # kernels, a dynamic trip count for the scan — work scales with
    # actual durations (mean ~8) instead of the max_dur cap
    from fcl_taco2_tpu.ops.decoder_pallas import tile_step_bounds
    order = np.argsort(-np.asarray(dur))
    enc_s = enc_seg[jnp.asarray(order)]
    dur_s = dur[jnp.asarray(order)]
    pos_s = position[jnp.asarray(order)]
    bounds = tile_step_bounds(dur_s)
    step_bound = dur_s.max()
    mask_s = frame_mask[jnp.asarray(order)]
    row["ragged_step_bound"] = int(np.asarray(step_bound))

    p32 = params
    row["scan_ragged_fp32_ms"] = _time_injit(
        lambda i, eps: decoder_inference(
            p32, state, cfg, enc_s + eps, dur_s, pos_s, mask_s,
            jax.random.fold_in(key, i), step_bound=step_bound), n) * 1e3
    if fits_vmem(cfg):
        try:
            row["fused_ragged_fp32_ms"] = _time_injit(
                lambda i, eps: fused_ar_decode(
                    params, enc_s + eps, pos_s, i,
                    zoneout=cfg.zoneout_rate, dropout=dropout,
                    weights_dtype=jnp.float32, bounds=bounds), n) * 1e3
        except Exception as exc:
            row["fused_ragged_fp32_ms"] = f"FAILED: {type(exc).__name__}"
    if hbm_stream_compatible(cfg):
        for wdt, tag in ((jnp.bfloat16, "hbm_stream_ragged_bf16_ms"),
                         (jnp.int8, "hbm_stream_ragged_int8_ms")):
            try:
                row[tag] = _time_injit(
                    lambda i, eps, _w=wdt: fused_ar_decode_hbm(
                        params, enc_s + eps, pos_s, i,
                        zoneout=cfg.zoneout_rate, dropout=dropout,
                        weights_dtype=_w, bounds=bounds), n) * 1e3
            except Exception as exc:
                row[tag] = f"FAILED: {type(exc).__name__}"

    best_scan = min(row["scan_fp32_ms"], row["scan_bf16_ms"])
    fused = [v for v in (row.get("fused_fp32_ms"), row.get("fused_bf16_ms"))
             if isinstance(v, float)]
    row["best_fused_speedup_vs_best_scan"] = \
        round(best_scan / min(fused), 2) if fused else None
    hbm = [v for v in (row.get("hbm_stream_bf16_ms"),
                       row.get("hbm_stream_fp32_ms"),
                       row.get("hbm_stream_int8_ms"))
           if isinstance(v, float)]
    row["best_hbm_stream_speedup_vs_best_scan"] = \
        round(best_scan / min(hbm), 2) if hbm else None
    ragged = [v for v in (row.get("scan_ragged_fp32_ms"),
                          row.get("fused_ragged_fp32_ms"),
                          row.get("hbm_stream_ragged_bf16_ms"),
                          row.get("hbm_stream_ragged_int8_ms"))
              if isinstance(v, float)]
    row["best_ragged_speedup_vs_best_capped"] = None
    capped = fused + hbm + [best_scan]
    if ragged and capped:
        row["best_ragged_speedup_vs_best_capped"] = \
            round(min(capped) / min(ragged), 2)
    print(json.dumps(row))
    return row


def bench_train_path(cfg, name, B, n):
    """Teacher-forced decoder (the TRAINING hot loop) under the XLA scan:
    forward and forward+backward cost, to bound what a fused training
    kernel could possibly win.  Residency cannot apply to the teacher
    (weights > VMEM) and a student training kernel would need a custom
    VJP; this records the measured ceiling for that investment."""
    import jax

    from fcl_taco2_tpu.models.decoder import decoder_teacher_forced
    from fcl_taco2_tpu.ops.regroup import build_plan

    rng = np.random.default_rng(0)
    Tmax = 48
    D = cfg.max_dur
    durations = np.clip(rng.poisson(8, (B, Tmax)), 1, D).astype(np.int32)
    olens = durations.sum(1).astype(np.int32)
    Lmax = int(np.ceil(olens.max() / 64) * 64)
    plan = build_plan(durations, olens, D, B * Tmax, Lmax)
    P = len(plan.seg_utt)
    enc_seg = jnp.asarray(
        rng.normal(size=(P, cfg.dec_idim)).astype(np.float32))
    seg_targets = jnp.asarray(
        rng.normal(size=(P, D, cfg.odim)).astype(np.float32))
    params, state = jax.jit(
        lambda k: decoder_init(k, cfg))(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    position = jnp.asarray(plan.position)
    frame_mask = jnp.asarray(plan.frame_mask)
    utt_gather = jnp.asarray(plan.utt_gather)
    utt_mask = jnp.asarray(plan.utt_mask)

    def fwd(params, enc, i):
        after, before, _, _ = decoder_teacher_forced(
            params, state, cfg, enc, seg_targets, position, frame_mask,
            utt_gather, utt_mask, jax.random.fold_in(key, i), train=True)
        return jnp.mean(jnp.abs(after)) + jnp.mean(jnp.abs(before))

    def full_grad(i, eps):
        # consume EVERY param grad: returning one leaf lets XLA dead-code
        # -eliminate the rest of the backward (measured: "fwd+bwd" ==
        # fwd + 1 ms), which is not what a train step pays
        grads = jax.grad(fwd)(params, enc_seg + eps, i)
        return jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(g), grads, jnp.float32(0.0))

    row = {"model": name, "B": B, "P": P, "D": D,
           "tf_scan_fwd_ms": _time_injit(
               lambda i, eps: fwd(params, enc_seg + eps, i), n) * 1e3,
           "tf_scan_fwd_bwd_ms": _time_injit(full_grad, n) * 1e3}
    print(json.dumps(row))
    return row


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--out", type=str, default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "PALLAS_decoder.json"))
    args = ap.parse_args(argv)

    warmup_transfers()
    rows = []
    for P in (128, 512, 2048):
        rows.append(bench_model(student_config(idim=70), "student", P,
                                args.reps))
    for P in (128, 512):
        rows.append(bench_model(teacher_config(idim=70), "teacher", P,
                                args.reps))
    train_rows = [
        bench_train_path(teacher_config(idim=70), "teacher", 16, args.reps),
        bench_train_path(student_config(idim=70), "student", 16, args.reps),
    ]
    payload = {
        "protocol": {
            "what": "AR decoder loop only (decoder_inference vs "
                    f"fused_ar_decode), D=max_dur steps; {args.reps} "
                    "iterations INSIDE one jitted fori_loop (RTT-free), "
                    "median of 3 loop calls, iterations CHAINED through a "
                    "zero-valued data dependency so loop-invariant code "
                    "motion cannot hoist per-batch work out of the loop "
                    "— host-loop timing of 2-5 ms kernels over the device "
                    "relay is noise-dominated (v2 train rows used host "
                    "loops; not comparable)",
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
        "rows": rows,
        "train_path_rows": train_rows,
        "conclusion": None,  # filled below
    }
    student_wins = [r["best_fused_speedup_vs_best_scan"] for r in rows
                    if r["model"] == "student"
                    and r["best_fused_speedup_vs_best_scan"]]
    teacher_fused = any(r["model"] == "teacher"
                        and r["best_fused_speedup_vs_best_scan"]
                        for r in rows)
    t_tf = train_rows[0]
    t_hbm = {r["P"]: r.get("best_hbm_stream_speedup_vs_best_scan")
             for r in rows if r["model"] == "teacher"}
    payload["conclusion"] = (
        f"fused (VMEM-resident) kernel student speedups {student_wins}; "
        "teacher VMEM-resident NOT APPLICABLE (weights exceed VMEM in "
        "fp32 and bf16) but the HBM weight-streaming kernel "
        f"(fused_ar_decode_hbm) wins {t_hbm} vs the scan per P — "
        "profitable ONLY on a single 128-row tile (each grid tile "
        "re-streams the weights), which is the batch-1 serving path; "
        "synthesize's auto policy gates on P <= TILE accordingly"
        + f"; training path: teacher teacher-forced scan fwd "
          f"{t_tf['tf_scan_fwd_ms']:.1f} ms / fwd+bwd "
          f"{t_tf['tf_scan_fwd_bwd_ms']:.1f} ms at B=16 — residency "
          "cannot apply (weights > VMEM) and a student training kernel "
          "would need a custom VJP for a fraction of these costs; "
          "recorded negative result, training keeps the XLA scan")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if os.path.exists(args.out):
        # preserve sections other tools recorded into this artifact
        # (train_scan_experiments, hbm_dma_experiments, ...) — only the
        # keys this script measures are refreshed
        with open(args.out) as f:
            existing = json.load(f)
        existing.update(payload)
        payload = existing
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
