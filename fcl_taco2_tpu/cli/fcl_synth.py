#!/usr/bin/env python3
"""Decode a manifest to mel spectrograms (ark/scp + speed report).

CLI mirror of /root/reference/tts_decode.py + tts.py:605-687: loads
model.json + a checkpoint, decodes every utterance in --json, writes
feats.ark/feats.scp (parallel-wavegan-decode compatible) and a
frames/sec summary.  Improvements: batched decode (reference is batch-1)
and --d-factor / --use-teacher-durations control knobs.
"""

import argparse
import os
import sys


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, required=True,
                   help="checkpoint path (snapshot.ep.N / model.loss.best)")
    p.add_argument("--model-conf", type=str, default=None,
                   help="exp dir containing model.json (default: the "
                        "checkpoint's directory)")
    p.add_argument("--json", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--frame-per-token", type=int, default=16,
                   help="output frame budget per input token when durations "
                        "are predicted (raise if truncation is reported)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--d-factor", type=float, default=1.0,
                   help="duration multiplier (speaking-rate control)")
    p.add_argument("--use-gt-durations", action="store_true",
                   help="use corpus durations instead of the predictor "
                        "(reference dur= override)")
    p.add_argument("--no-ark", action="store_true")
    p.add_argument("--n-devices", type=int, default=None,
                   help="shard the decode batch over this many devices "
                        "(default 1; batch-size must divide it)")
    p.add_argument("--no-ragged-decode", action="store_true",
                   help="disable the duration-sorted, duration-bounded AR "
                        "decode (debug/parity aid: the legacy path runs "
                        "every phoneme to the max_dur cap like the "
                        "reference, tts.py:243-263)")
    p.add_argument("--quantize", choices=("none", "int8"), default="none",
                   help="int8: stream the weight-streaming Pallas "
                        "decoder's big matrices as per-column int8 (half "
                        "the DMA bytes; weight-only, ~1e-2 rel mel error)")
    p.add_argument("--decoder-backend", default="auto",
                   choices=("auto", "scan", "pallas", "pallas_hbm",
                            "hybrid"),
                   help="AR decode backend (Tacotron2SA.decode_segments); "
                        "'hybrid' = head tile on the weight-streaming "
                        "kernel + residual-bounded scan for the rest "
                        "(teacher-size multi-tile batches)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    import jax
    import numpy as np

    from fcl_taco2_tpu.data import load_manifest
    from fcl_taco2_tpu.infer import Synthesizer
    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.train.checkpoint import (load_model_json,
                                                load_params_only)

    exp_dir = args.model_conf or os.path.dirname(args.model)
    cfg, _ = load_model_json(exp_dir)
    model = Tacotron2SA(cfg)
    from fcl_taco2_tpu.utils.device import zeros_like_shapes
    template_p, template_s = zeros_like_shapes(model.init,
                                               jax.random.PRNGKey(0))
    params, state = load_params_only(args.model, template_p, template_s)

    utts = load_manifest(args.json)
    mesh = None
    if args.n_devices and args.n_devices > 1:
        from fcl_taco2_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.n_devices)
    synth = Synthesizer(model, params, state, batch_size=args.batch_size,
                        frame_per_token=args.frame_per_token, mesh=mesh,
                        ragged_decode=not args.no_ragged_decode,
                        quantize=args.quantize,
                        decoder_backend=args.decoder_backend)
    mean_fps = synth.synth_manifest(
        utts, args.out, write_ark=not args.no_ark,
        rng=jax.random.PRNGKey(args.seed),
        use_gt_durations=args.use_gt_durations, d_factor=args.d_factor)
    print(f"decoded {len(utts)} utts, mean {mean_fps:.1f} frames/sec "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
