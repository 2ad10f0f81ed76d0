#!/usr/bin/env python3
"""Quality cost of int8 weight-only decoder quantization, measured
end-to-end: train a teacher on the synthetic corpus, decode the held-out
test shard with fp32 weights and with the int8-dequantized equivalent of
the three streamed matrices, and report the MCD/L1 deltas.

Why dequantized-equivalent: the int8 streaming kernel
(ops/decoder_pallas.fused_ar_decode_hbm, weights_dtype=int8) computes
``(h @ codes) * scale`` per step == ``h @ (codes * scale)`` (the scale is
per output column), so substituting ``codes * scale`` for lstm0.wh /
lstm1.wx / lstm1.wh and decoding through the normal scan measures the
quantization's quality cost on any backend (here CPU, where the corpus
training is feasible during TPU-relay outages).  Two honest deviations
from the deployed kernel, both pessimistic: serving casts params to the
checkpoint's compute_dtype (bfloat16) BEFORE the kernel quantizes, so we
quantize the bf16-cast weights to get the same codes/scales; and the
substituted ``codes * scale`` values get one extra bf16 rounding when the
eval decode casts params (the kernel keeps codes exact and scales fp32).
That rounding is ~bf16 eps, the same order as the int8 per-column step —
so the reported delta UPPER-BOUNDS the kernel's true quantization cost.
Kernel-vs-scan numerics themselves are pinned by
tests/test_decoder_pallas.py.

Writes results/QUANT_decode.json.

Usage:
  python scripts/quant_quality.py --cpu [--n-utts 240] [--epochs 30]
A pre-existing --workdir (from a previous run or from
scripts/mcd_benchmark.py --stage teacher) skips straight to the decode.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=str, default="/tmp/fcl_quant_run")
    p.add_argument("--n-utts", type=int, default=240)
    p.add_argument("--n-val", type=int, default=24)
    p.add_argument("--n-test", type=int, default=24)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon sitecustomize "
                        "latches JAX_PLATFORMS before user code)")
    p.add_argument("--out", type=str,
                   default=os.path.join(REPO, "results",
                                        "QUANT_decode.json"))
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import mcd_benchmark
    from cli import fcl_eval, fcl_synth
    from fcl_taco2_tpu.train.checkpoint import restore_checkpoint
    from flax import serialization

    wd = args.workdir
    exp = os.path.join(wd, "exp_teacher")
    feat = os.path.join(wd, "features")
    ckpt = os.path.join(exp, "model.loss.best")
    t0 = time.time()

    if not os.path.exists(ckpt):
        print(f"[train] no checkpoint in {wd}; running the corpus + "
              "teacher stages ...", flush=True)
        t1 = time.time()
        mcd_benchmark.main([
            "--workdir", wd, "--stage", "teacher",
            "--n-utts", str(args.n_utts), "--n-val", str(args.n_val),
            "--n-test", str(args.n_test), "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size),
            "--out", os.path.join(wd, "mcd_teacher.json")])
        teacher_stage_sec = time.time() - t1
    else:
        teacher_stage_sec = None

    # ---- int8-dequantized-equivalent checkpoint of the streamed matrices
    import jax.numpy as jnp
    from fcl_taco2_tpu.ops.decoder_pallas import quantize_per_column
    from fcl_taco2_tpu.train.checkpoint import load_model_json
    cfg, _ = load_model_json(exp)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    payload, _, _ = restore_checkpoint(ckpt)
    dec = payload["params"]["decoder"]
    snr_db = {}
    for top, leaf in (("lstm0", "wh"), ("lstm1", "wx"), ("lstm1", "wh")):
        # quantize the compute_dtype-cast weights: serving casts params
        # BEFORE the kernel quantizes, so these are the kernel's codes
        w = np.asarray(dec[top][leaf], np.float32)
        w_in = np.asarray(np.asarray(w, np.float32).astype(compute_dtype),
                          np.float32)
        q, s = quantize_per_column(w_in)
        deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
        err = deq - w_in
        snr_db[f"{top}.{leaf}"] = round(float(
            10 * np.log10(np.mean(w_in ** 2)
                          / max(np.mean(err ** 2), 1e-30))), 1)
        dec[top][leaf] = deq
    ckpt8 = os.path.join(exp, "model.int8eq")
    with open(ckpt8, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"[quant] per-matrix weight SNR (dB): {snr_db}", flush=True)

    # ---- decode the test shard with both checkpoints, same seed (the
    # duration predictor is NOT quantized, so both variants produce the
    # same segment plan and the same prenet-dropout draws)
    test_json = os.path.join(feat, "test_data.json")
    results = {}
    mels = {}
    for tag, model_path in (("fp32", ckpt), ("int8", ckpt8)):
        for dur_tag, extra in (("pred_dur", []),
                               ("gt_dur", ["--use-gt-durations"])):
            # mcd_benchmark --stage teacher already decoded + evaled the
            # fp32 checkpoint with identical settings (seed 1, batch 8,
            # decode_and_eval) — reuse instead of re-synthesizing
            reuse = os.path.join(wd, f"decode_{dur_tag}")
            if tag == "fp32" and os.path.exists(
                    os.path.join(reuse, "eval.json")):
                out_dir = reuse
            else:
                out_dir = os.path.join(wd, f"decode_{tag}_{dur_tag}")
                fcl_synth.main(["--model", model_path, "--json",
                                test_json, "--out", out_dir,
                                "--batch-size", "8", *extra])
                fcl_eval.main(
                    ["--feats-scp", os.path.join(out_dir, "feats.scp"),
                     "--json", test_json,
                     "--out", os.path.join(out_dir, "eval.json")])
            with open(os.path.join(out_dir, "eval.json")) as f:
                results[f"{tag}_{dur_tag}"] = json.load(f)["summary"]
            mels[(tag, dur_tag)] = out_dir

    # ---- direct fp32-vs-int8 deviation on the SAME utterances
    from fcl_taco2_tpu.infer.ark import read_ark_matrix
    from fcl_taco2_tpu.infer.metrics import (mel_cepstral_distortion,
                                             mel_l1)
    mean, std = np.load(os.path.join(feat, "mel_stats.npy"))
    direct = {}
    for dur_tag in ("pred_dur", "gt_dur"):
        scp_a = os.path.join(mels[("fp32", dur_tag)], "feats.scp")
        scp_b = os.path.join(mels[("int8", dur_tag)], "feats.scp")
        refs = dict(ln.split(None, 1) for ln in open(scp_b))
        mcds, l1s = [], []
        for ln in open(scp_a):
            utt, loc = ln.split(None, 1)
            a = read_ark_matrix(loc.strip()) * std + mean
            b = read_ark_matrix(refs[utt].strip()) * std + mean
            mcds.append(mel_cepstral_distortion(a, b))
            l1s.append(mel_l1(a, b))
        direct[dur_tag] = {"mcd_db": round(float(np.mean(mcds)), 3),
                           "l1": round(float(np.mean(l1s)), 4)}

    payload_out = {
        "protocol": {
            "what": "int8 weight-only quantization of the streamed "
                    "decoder matrices (lstm0.wh, lstm1.wx, lstm1.wh; "
                    "quantize_per_column) vs fp32, same checkpoint, same "
                    "seed, decoded via the scan with dequantized weights "
                    "(mathematically the int8 kernel's product modulo "
                    "MXU accumulation dtype)",
            "corpus": "formant-synthesized corpus "
                      "(fcl_taco2_tpu/audio/synthcorpus.py)",
            "n_utts": args.n_utts, "n_test": args.n_test,
            "epochs": args.epochs,
            "model": "512-d teacher (conf/train_fcl_taco2.teacher.yaml)",
            "compute_dtype": str(compute_dtype),
            "quantize_input": "weights cast to compute_dtype first, "
                              "matching the serving order; the eval "
                              "decode adds one bf16 rounding of "
                              "codes*scale the kernel does not have, so "
                              "deltas are an upper bound",
            "backend": jax.default_backend(),
        },
        "weight_snr_db": snr_db,
        # corpus gen + preprocess + training + fp32 decode/eval, i.e. the
        # whole mcd_benchmark teacher stage (None when a checkpoint was
        # reused)
        "teacher_stage_wall_sec": teacher_stage_sec
        and round(teacher_stage_sec, 1),
        "vs_ground_truth": results,
        "int8_vs_fp32_direct": direct,
        "total_wall_sec": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if os.path.exists(args.out):  # hand-curated commentary survives re-runs
        with open(args.out) as f:
            old = json.load(f)
        if "note" in old.get("protocol", {}):
            payload_out["protocol"]["superseded_note"] = \
                old["protocol"]["note"]
    with open(args.out, "w") as f:
        json.dump(payload_out, f, indent=2)
    print(json.dumps({"weight_snr_db": snr_db,
                      "int8_vs_fp32_direct": direct}, indent=2))
    for dur_tag in ("pred_dur", "gt_dur"):
        a = results[f"fp32_{dur_tag}"]["mcd"]
        b = results[f"int8_{dur_tag}"]["mcd"]
        print(f"MCD vs ground truth ({dur_tag}): fp32 {a:.3f} dB, "
              f"int8 {b:.3f} dB, delta {b - a:+.4f} dB")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
