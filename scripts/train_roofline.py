#!/usr/bin/env python3
"""Training-step roofline: is 11-14% MFU the LSTM-shape ceiling, or does a
fused/custom-VJP training decoder have headroom?  (VERDICT r03 #2)

Measures on the real TPU, teacher config, duration-classed batch (the
fcl_train default):
- full train step, loss forward, and the implied backward (chained
  fori_loop protocol, readback-forced)
- XLA's own cost analysis (flops, bytes accessed) and compiled
  memory_analysis for the step
- an ANALYTIC per-class traffic model of the decoder scans under three
  backward strategies:
    A. per-step dW accumulation in HBM (what XLA's scan transpose does:
       the (3H,4H) fp32 gradient accumulators are read+written every
       scan step)
    B. dW as one post-scan batched GEMM over saved (h, dgates)
       (a custom-VJP restructure; sequential part only propagates dh)
    C. MXU floor (flops / peak)

The verdict (kernel worth building or not) is appended to
results/PALLAS_decoder.json under "train_kernel_roofline".

Usage: python scripts/train_roofline.py [--reps 10]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_PEAK_BF16 = 197e12
V5E_HBM_GBS = 819e9

N_PHONES = 96
MEAN_DUR = 8


def class_shapes(B, classes):
    """The classed plan's (P_c, D_c) shapes for the bench batch."""
    from fcl_taco2_tpu.ops.regroup import (build_classed_plan,
                                           duration_class_caps)

    rng = np.random.default_rng(0)
    durations = np.clip(rng.poisson(MEAN_DUR, (B, N_PHONES)), 1, 50).astype(
        np.int32)
    olens = durations.sum(1).astype(np.int32)
    Lmax = int(np.ceil(olens.max() / 64) * 64)
    caps = duration_class_caps(list(durations), classes, B, cap_bucket=64)
    plan = build_classed_plan(durations, olens, classes, caps, Lmax)
    return [(int(c.seg_utt.shape[0]), int(c.position.shape[1]))
            for c in plan.classes], int(olens.sum())


def analytic_model(shapes, H=1024, units=256, odim=80, wdt=2):
    """Bytes/flops of the decoder scans fwd+bwd per strategy.

    Per scan step (class with P rows): 3 recurrent GEMMs (P,H)x(H,4H)
    [wh0, wx1, wh1] + the prenet-gate GEMM (P,units)x(units,4H); weights
    read once per step (25 MB bf16 at H=1024 — too big for VMEM
    residency, streaming is the floor); per-step state/save traffic in
    fp32 (4 bytes)."""
    W3 = 3 * H * 4 * H * wdt            # recurrent weights per step
    Wpre = units * 4 * H * wdt
    rows = []
    tot = {"flops_fwd": 0.0, "A_bytes": 0.0, "B_bytes": 0.0}
    for P, D in shapes:
        gemm_flops = 2 * P * (3 * H + units) * 4 * H      # per step fwd
        fwd_state = P * (2 * H + 2 * H) * 4               # h0,h1 saves + c rw
        fwd = D * (W3 + Wpre + fwd_state + P * 4 * H * 4)  # + gates write
        # backward strategy A: weights again + saved reads + dgates +
        # per-step dW accumulator read+write (fp32)
        dW_acc = 2 * (3 * H * 4 * H + units * 4 * H) * 4
        bwd_A = D * (W3 + Wpre + fwd_state + P * 4 * H * 4 + dW_acc)
        # strategy B: sequential part only moves weights + dh/dgates;
        # dW = one GEMM over the saved (P*D) rows at the end
        bwd_B = D * (W3 + Wpre + fwd_state + P * 4 * H * 4) \
            + 2 * P * D * (H + 4 * H) * 4
        tot["flops_fwd"] += D * gemm_flops
        tot["A_bytes"] += fwd + bwd_A
        tot["B_bytes"] += fwd + bwd_B
        rows.append({"P": P, "D": D,
                     "fwd_GB": round(fwd / 1e9, 3),
                     "bwd_A_GB": round(bwd_A / 1e9, 3),
                     "bwd_B_GB": round(bwd_B / 1e9, 3)})
    # fwd+bwd flops ~= 3x fwd (bwd has ~2x the GEMM work)
    tot["flops_total"] = 3 * tot["flops_fwd"]
    return rows, tot


def measure(B, classes, reps, unroll=1):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from bench import _device_times, _train_batch
    import bench

    from fcl_taco2_tpu.models import Tacotron2SA, teacher_config
    from fcl_taco2_tpu.parallel.mesh import make_mesh, shard_batch
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState
    from fcl_taco2_tpu.train.step import make_train_step
    from fcl_taco2_tpu.utils.device import warmup_transfers

    warmup_transfers()
    bench.TRAIN_B = B
    cfg = teacher_config(idim=70, odim=80, duration_classes=classes,
                         decoder_scan_unroll=unroll)
    model = Tacotron2SA(cfg)
    mesh = make_mesh(1)
    batch, olens = _train_batch(cfg.effective_duration_classes)
    batch = shard_batch(mesh, batch)
    params, mstate = jax.jit(model.init)(jax.random.PRNGKey(0))
    tx = build_optimizer()
    ts = TrainState(params, mstate, tx.init(params), np.int32(0))
    step_raw = make_train_step(model, tx, mesh, donate=False)
    n = reps

    def timed(loop):
        # bench.py's readback-forced protocol: RTT is measured by
        # re-fetching an ALREADY-READY buffer (re-calling the jitted loop
        # to measure RTT would re-execute it and subtract the whole run —
        # the bug behind the first draft's 0.0 ms readings)
        f = jax.jit(loop)
        keys = iter(range(1000))
        per = _device_times(lambda: f(jax.random.PRNGKey(next(keys))),
                            n, reps=3)
        return float(np.median(per)) * 1e3

    def step_loop(key):
        # the carried/returned value must be the LOSS: returning only the
        # step counter lets XLA dead-code-eliminate the whole train step
        # (observed: 0.0 ms readings)
        def body(i, carry):
            ts2, report = step_raw(carry[0], batch,
                                   jax.random.fold_in(key, i))
            return (ts2, report["loss"])
        return jax.lax.fori_loop(0, n, body, (ts, jnp.float32(0.0)))[1]

    def fwd_loop(key):
        def body(i, acc):
            loss, _ = model.loss_fn(params, mstate, batch,
                                    jax.random.fold_in(key, i), train=True)
            return acc + loss
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    step_ms = timed(step_loop)
    fwd_ms = timed(fwd_loop)

    # XLA's own numbers for ONE step
    one = jax.jit(lambda t, b, k: step_raw(t, b, k)[1]["loss"])
    compiled = one.lower(ts, batch, jax.random.PRNGKey(0)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    ma = compiled.memory_analysis()
    return {
        "B": B, "frames": int(olens.sum()),
        "step_ms": round(step_ms, 2), "loss_fwd_ms": round(fwd_ms, 2),
        "implied_bwd_update_ms": round(step_ms - fwd_ms, 2),
        "xla_flops": float(ca.get("flops", -1)),
        "xla_bytes_accessed_gb": round(
            float(ca.get("bytes accessed", -1)) / 2 ** 30, 3),
        "peak_hbm_gb": round((ma.argument_size_in_bytes
                              + ma.output_size_in_bytes
                              + ma.temp_size_in_bytes) / 2 ** 30, 3),
        "temp_gb": round(ma.temp_size_in_bytes / 2 ** 30, 3),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", type=str, default=os.path.join(
        REPO, "results", "PALLAS_decoder.json"))
    args = ap.parse_args(argv)

    classes = (8, 16, 32, 50)
    section = {"protocol": {
        "what": "teacher train step roofline at B=16/64, duration-classed "
                "scans (fcl_train default), chained fori_loop timing; "
                "analytic decoder traffic per backward strategy (A: "
                "per-step HBM dW accumulation = XLA scan transpose; B: "
                "post-scan batched dW GEMM; C: MXU floor)",
        "hw": "v5e: 197 TF/s bf16, 819 GB/s HBM"}}
    for B in (16, 64):
        shapes, frames = class_shapes(B, classes)
        rows, tot = analytic_model(shapes)
        meas = measure(B, classes, args.reps)
        t_A = tot["A_bytes"] / V5E_HBM_GBS * 1e3
        t_B = tot["B_bytes"] / V5E_HBM_GBS * 1e3
        t_C = tot["flops_total"] / V5E_PEAK_BF16 * 1e3
        section[f"b{B}"] = {
            "class_shapes": shapes, "measured": meas,
            "analytic_decoder": {
                "per_class": rows,
                "strategy_A_ms": round(t_A, 2),
                "strategy_B_ms": round(t_B, 2),
                "mxu_floor_ms": round(t_C, 2),
                "xla_bytes_over_hbm_ms": round(
                    meas["xla_bytes_accessed_gb"] * 2 ** 30
                    / V5E_HBM_GBS * 1e3, 2),
            },
        }
        # the actionable experiment: scan unroll amortizes the per-step
        # dW-accumulator traffic (strategy A -> A/u); measured in the
        # same session so the comparison is apples-to-apples
        for u in (4, 8):
            m = measure(B, classes, args.reps, unroll=u)
            section[f"b{B}"][f"measured_unroll{u}"] = m
            print(f"B={B} unroll={u}: {m['step_ms']} ms", flush=True)
        print(json.dumps(section[f"b{B}"], indent=1), flush=True)
        # persist after every batch size: remote sessions die mid-run
        with open(args.out) as f:
            payload = json.load(f)
        payload["train_kernel_roofline"] = section
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"updated {args.out} (through b{B})", flush=True)


if __name__ == "__main__":
    main()
