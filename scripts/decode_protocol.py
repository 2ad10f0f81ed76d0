#!/usr/bin/env python3
"""Full-shard serving protocol: split a held-out corpus with
cli/fcl_splitjson, decode every shard with cli/fcl_synth, and record the
per-utterance speed DISTRIBUTION (p50/p95), not just the mean — the
reference logs one speed line per utterance (tts.py:665-684); a single
mean hides straggler buckets (VERDICT r2 next #6).

Expects a preprocessed feature root (phn2idx-compatible with the model)
and a trained checkpoint; writes results/DECODE_protocol.json.

Usage:
  python scripts/decode_protocol.py \
      --model /tmp/fcl_mcd_run/exp_teacher/model.loss.best \
      --json /tmp/fcl_decode500/features/train_data.json \
      [--parts 10] [--batch-size 8] [--out results/DECODE_protocol.json]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--json", required=True)
    p.add_argument("--parts", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--label", type=str, default="teacher")
    p.add_argument("--extra-synth", nargs="*", default=[],
                   help="extra fcl_synth flags; dash-leading values must "
                        "use the = form with quoting, e.g. "
                        "--extra-synth='--decoder-backend hybrid' "
                        "(each element is whitespace-split)")
    p.add_argument("--out", type=str,
                   default=os.path.join(REPO, "results",
                                        "DECODE_protocol.json"))
    args = p.parse_args(argv)
    args.extra_synth = [t for s in args.extra_synth for t in s.split()]

    from cli import fcl_splitjson, fcl_synth

    fcl_splitjson.main([args.json, "--parts", str(args.parts)])
    base = os.path.basename(args.json).rsplit(".", 1)[0]
    split_dir = os.path.join(os.path.dirname(args.json),
                             f"split{args.parts}utt")
    shards = sorted(glob.glob(os.path.join(split_dir, f"{base}.*.json")),
                    key=lambda s: int(s.rsplit(".", 2)[1]))
    assert len(shards) == args.parts, shards

    utt_fps, utt_frames, shard_means, shard_totals = [], [], [], []
    t0 = time.time()
    for k, shard in enumerate(shards):
        out_dir = os.path.join("/tmp/fcl_decode_proto", f"shard{k + 1}")
        fcl_synth.main(["--model", args.model, "--json", shard,
                        "--out", out_dir, "--batch-size",
                        str(args.batch_size), "--no-ark",
                        *args.extra_synth])
        with open(os.path.join(out_dir, "decode.txt")) as f:
            for ln in f:
                parts = ln.split()
                if parts[0] == "mean_frames_per_sec":
                    shard_means.append(float(parts[1]))
                elif parts[0] == "total_frames_per_sec":
                    shard_totals.append(float(parts[1]))
                elif len(parts) >= 7 and parts[1] == "frames":
                    # "<utt> frames <n> batch_wall_sec <t>
                    #  frames_per_sec <fps>"
                    utt_frames.append(int(parts[2]))
                    utt_fps.append(float(parts[6]))
        print(f"shard {k + 1}/{args.parts}: {len(utt_fps)} utts so far",
              flush=True)
    wall = time.time() - t0

    fps = np.asarray(utt_fps)
    payload = {
        "protocol": {
            "what": "cli/fcl_splitjson -> cli/fcl_synth over a full "
                    "held-out shard; per-utterance frames/sec from each "
                    "utterance's frames over its batch's wall clock "
                    "(decode.txt lines); first-compile excluded only "
                    "per-process, so shard 1 carries jit cost — the "
                    "distribution reflects REAL serving incl. compile "
                    "amortization",
            "model": args.label,
            "ckpt": args.model,
            "json": args.json,
            "parts": args.parts,
            "batch_size": args.batch_size,
        },
        "n_utts": len(utt_fps),
        "total_frames": int(np.sum(utt_frames)),
        "total_wall_sec": round(wall, 1),
        "per_utt_frames_per_sec": {
            "p5": round(float(np.percentile(fps, 5)), 1),
            "p50": round(float(np.percentile(fps, 50)), 1),
            "p95": round(float(np.percentile(fps, 95)), 1),
            "mean": round(float(fps.mean()), 1),
        },
        "per_shard_mean_fps": [round(m, 1) for m in shard_means],
        "per_shard_pipelined_total_fps": [round(m, 1)
                                          for m in shard_totals],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload["per_utt_frames_per_sec"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
