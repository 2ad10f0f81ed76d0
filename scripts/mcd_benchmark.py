#!/usr/bin/env python3
"""End-to-end MCD measurement: corpus -> preprocess -> teacher training to
convergence -> decode the held-out test shard -> MCD/L1/RMSE + frames/sec.

This is the measurement BASELINE.md's "MCD parity" row asks for, run on a
formant-synthesized corpus (audio/synthcorpus.py) because LJSpeech is not
downloadable in this environment.  The whole reference protocol is followed
(BASELINE.md:15-26): random train/val/test split by the preprocessor,
max-phone-duration filter, 80 mel / 1024 fft / 256 hop / 22.05 kHz,
best-validation checkpoint, duration/pitch/energy from the predictors
(plus a ground-truth-duration variant), frames/sec from the decode wall
clock.

Writes results/MCD_e2e.json and prints the summary.

Usage: python scripts/mcd_benchmark.py [--n-utts 480] [--epochs 80] ...
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=str, default="/tmp/fcl_mcd_run")
    p.add_argument("--n-utts", type=int, default=480)
    p.add_argument("--n-val", type=int, default=40)
    p.add_argument("--n-test", type=int, default=40)
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=137)  # reference seed
    p.add_argument("--out", type=str,
                   default=os.path.join(REPO, "results", "MCD_e2e.json"))
    p.add_argument("--corpus-seed", type=int, default=7)
    p.add_argument("--stage", choices=["all", "teacher", "student"],
                   default="all",
                   help="'student' reuses an existing teacher run in "
                        "--workdir (KD + decode + eval only)")
    args = p.parse_args(argv)

    from cli import fcl_eval, fcl_preprocess, fcl_synth, fcl_train
    from fcl_taco2_tpu.audio.synthcorpus import generate_corpus

    wd = args.workdir
    corpus = os.path.join(wd, "corpus")
    feat = os.path.join(wd, "features")
    exp = os.path.join(wd, "exp_teacher")
    exp_s = os.path.join(wd, "exp_student")
    t_start = time.time()
    results = {}
    train_sec = kd_sec = None

    def decode_and_eval(ckpt, tag, extra_synth=()):
        out_dir = os.path.join(wd, f"decode_{tag}")
        fcl_synth.main(["--model", ckpt,
                        "--json", os.path.join(feat, "test_data.json"),
                        "--out", out_dir, "--batch-size", "8",
                        *extra_synth])
        with open(os.path.join(out_dir, "decode.txt")) as f:
            fps = next(float(ln.split()[1]) for ln in f
                       if ln.startswith("mean_frames_per_sec"))
        print(f"[eval] {tag} ...", flush=True)
        report_path = os.path.join(out_dir, "eval.json")
        fcl_eval.main(["--feats-scp", os.path.join(out_dir, "feats.scp"),
                       "--json", os.path.join(feat, "test_data.json"),
                       "--out", report_path])
        with open(report_path) as f:
            summary = json.load(f)["summary"]
        results[tag] = dict(summary, frames_per_sec=fps)

    if args.stage in ("all", "teacher"):
        if os.path.exists(os.path.join(feat, "train_data.json")):
            print("[1-2/5] reusing existing corpus + features in "
                  f"{feat}", flush=True)
        else:
            print(f"[1/5] generating {args.n_utts}-utterance corpus ...",
                  flush=True)
            generate_corpus(corpus, n_utts=args.n_utts,
                            seed=args.corpus_seed, log=print)

            print("[2/5] preprocessing (mel/f0/energy, normalize, split) "
                  "...", flush=True)
            fcl_preprocess.main([
                "--data-root", corpus, "--feature-root", feat,
                "--textgrid-root", os.path.join(corpus, "tg"),
                "--n-val", str(args.n_val), "--n-test", str(args.n_test),
                "--seed", "1"])

        print(f"[3/5] training the 512-d teacher for {args.epochs} "
              "epochs ...", flush=True)
        t0 = time.time()
        fcl_train.main([
            "--train-json", os.path.join(feat, "train_data.json"),
            "--valid-json", os.path.join(feat, "val_data.json"),
            "--outdir", exp, "--perform-KD", "False",
            "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size),
            "--seed", str(args.seed), "--n-devices", "1"])
        train_sec = time.time() - t0

        print("[4/5] decoding + evaluating the test shard ...", flush=True)
        ckpt = os.path.join(exp, "model.loss.best")
        decode_and_eval(ckpt, "pred_dur")
        decode_and_eval(ckpt, "gt_dur", ["--use-gt-durations"])

    if args.stage in ("all", "student"):
        # reference flagship workflow part 2: distill FCL-taco2-S from the
        # frozen teacher (student_model_training.sh), then measure the
        # student's own MCD + speed (the student is the model the paper
        # ships; on TPU it also rides the fused Pallas decoder)
        print(f"[KD] distilling the 256-d student for {args.epochs} "
              "epochs ...", flush=True)
        t0 = time.time()
        fcl_train.main([
            "--config", os.path.join(REPO, "conf",
                                     "train_fcl_taco2.student.yaml"),
            "--train-json", os.path.join(feat, "train_data.json"),
            "--valid-json", os.path.join(feat, "val_data.json"),
            "--outdir", exp_s, "--perform-KD", "True",
            "--share-proj", "True",
            "--teacher-config", os.path.join(
                REPO, "conf", "train_fcl_taco2.teacher.yaml"),
            "--teacher-checkpoint", os.path.join(exp, "model.loss.best"),
            "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size),
            "--seed", str(args.seed), "--n-devices", "1"])
        kd_sec = time.time() - t0
        ckpt_s = os.path.join(exp_s, "model.loss.best")
        decode_and_eval(ckpt_s, "student_pred_dur")
        decode_and_eval(ckpt_s, "student_gt_dur", ["--use-gt-durations"])

    # calibration floors: MCD of predicting the train-mean frame, and of
    # comparing mismatched utterances — the corpus has irreducible
    # stochastic excitation (noise-shaped fricatives, jitter), so absolute
    # MCD must be read against these bounds
    import numpy as np
    from fcl_taco2_tpu.data import load_manifest
    from fcl_taco2_tpu.data.manifest import _load_feat
    from fcl_taco2_tpu.infer.metrics import mel_cepstral_distortion
    mean, std = np.load(os.path.join(feat, "mel_stats.npy"))
    test_utts = load_manifest(os.path.join(feat, "test_data.json"))
    mels = [_load_feat(u.mel_path, u.filetypes[0]) * std + mean
            for u in test_utts]
    floors = {
        "predict_mean_mcd": float(np.mean([
            mel_cepstral_distortion(np.broadcast_to(mean, m.shape), m)
            for m in mels])),
        "mismatched_utterance_mcd": float(np.mean([
            mel_cepstral_distortion(mels[(i + 1) % len(mels)], m)
            for i, m in enumerate(mels)])),
    }

    import jax
    payload = {
        "protocol": {
            "corpus": "formant-synthesized speech-like corpus "
                      "(fcl_taco2_tpu/audio/synthcorpus.py), LJSpeech "
                      "unavailable offline",
            "n_utts": args.n_utts, "n_val": args.n_val,
            "n_test": args.n_test, "epochs": args.epochs,
            "batch_size": args.batch_size,
            "model": "FCL-taco2-T (512-d teacher) -> KD FCL-taco2-S "
                     "(256-d student), bf16 compute",
            "checkpoint": "model.loss.best",
            "features": "80 mel / 1024 fft / 256 hop / 22.05 kHz",
            "mcd": "dB over DENORMALIZED log-mels (fcl_eval auto-applies "
                   "mel_stats.npy), DCT-II cepstra c1..c13, trim-to-min "
                   "alignment",
            "backend": jax.default_backend(),
        },
        "teacher_train_wall_sec": train_sec and round(train_sec, 1),
        "kd_train_wall_sec": kd_sec and round(kd_sec, 1),
        "total_wall_sec": round(time.time() - t_start, 1),
        "floors": floors,
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if os.path.exists(args.out):  # staged runs merge into one artifact
        with open(args.out) as f:
            old = json.load(f)
        payload["results"] = {**old.get("results", {}), **results}
        for k in ("teacher_train_wall_sec", "kd_train_wall_sec"):
            payload[k] = payload[k] or old.get(k)
        if "notes" in old:  # hand-curated commentary survives re-runs
            payload["notes"] = old["notes"]
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload["results"], indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
