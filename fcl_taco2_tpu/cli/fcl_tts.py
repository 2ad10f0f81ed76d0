#!/usr/bin/env python3
"""End-to-end TTS: manifest (or token file) -> wav, one process.

Fuses the reference's 3-process chain (tts_decode.py -> kaldi ark ->
parallel-wavegan-decode, inference_teacher.sh) into a single device
pipeline (acoustic model + PWG in one jit per shape bucket), reporting the
realtime factor.
"""

import argparse
import os
import sys

from fcl_taco2_tpu.cli.fcl_vocode import write_wav  # noqa: E402


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, required=True,
                   help="acoustic checkpoint (snapshot / model.loss.best)")
    p.add_argument("--model-conf", type=str, default=None)
    p.add_argument("--json", type=str, required=True,
                   help="manifest with tokenids to synthesize")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--pwg-checkpoint", type=str, default=None,
                   help="official ParallelWaveGAN .pkl (random init if "
                        "omitted — smoke runs only)")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--pwg-config", type=str, default=None,
                   help="json with PWGConfig field overrides (layers, "
                        "upsample_scales, ...) for non-default vocoders")
    p.add_argument("--stream", action="store_true",
                   help="low-latency path: per-utterance chunked "
                        "synthesis through infer.stream.StreamTTS "
                        "(time-to-first-audio ~90 ms, "
                        "results/STREAM_tts.json) instead of batched "
                        "whole-utterance jit")
    p.add_argument("--quantize", choices=("none", "int8"), default="none",
                   help="int8: weight-only quantized decode (halves the "
                        "weight-streaming decoder kernel's DMA bytes; "
                        "effective where that kernel applies — teacher-"
                        "size models on single-tile phoneme batches)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    import jax
    import numpy as np

    from fcl_taco2_tpu.data import load_manifest
    from fcl_taco2_tpu.infer.pipeline import TTSPipeline
    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.train.checkpoint import (load_model_json,
                                                load_params_only)
    from fcl_taco2_tpu.utils.device import zeros_like_shapes
    from fcl_taco2_tpu.vocoder.pwg import (PWGConfig, load_pwg_checkpoint,
                                           pwg_init)

    exp_dir = args.model_conf or os.path.dirname(args.model)
    cfg, _ = load_model_json(exp_dir)
    model = Tacotron2SA(cfg)
    tp, ts = zeros_like_shapes(model.init, jax.random.PRNGKey(0))
    params, state = load_params_only(args.model, tp, ts)

    pwg_over = {"aux_channels": cfg.odim}
    if args.pwg_config:
        import json
        with open(args.pwg_config) as f:
            pwg_over.update(json.load(f))
        if "upsample_scales" in pwg_over:
            pwg_over["upsample_scales"] = tuple(pwg_over["upsample_scales"])
    pwg_cfg = PWGConfig(**pwg_over)
    if args.pwg_checkpoint:
        pwg_params = load_pwg_checkpoint(args.pwg_checkpoint, pwg_cfg)
    else:
        print("WARNING: no --pwg-checkpoint; vocoder has random weights")
        pwg_params = jax.jit(lambda k: pwg_init(k, pwg_cfg))(
            jax.random.PRNGKey(0))

    utts = load_manifest(args.json)
    os.makedirs(args.outdir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    if args.stream:
        import time

        from fcl_taco2_tpu.infer.stream import StreamTTS

        st = StreamTTS(model, params, state, pwg_params, pwg_cfg,
                       quantize=args.quantize)
        ttfas, rtfs = [], []
        for u in utts:
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            ttfa = None
            chunks = []
            for c in st.stream(np.asarray(u.tokenids, np.int32), sub):
                if ttfa is None:
                    ttfa = time.perf_counter() - t0
                chunks.append(c)
            dt = time.perf_counter() - t0
            wav = (np.concatenate(chunks) if chunks
                   else np.zeros(0, np.float32))
            if wav.size:
                rtfs.append(wav.size / args.sample_rate / dt)
                ttfas.append(ttfa)
            write_wav(os.path.join(args.outdir, f"{u.uttid}.wav"), wav,
                      args.sample_rate)
        print(f"streamed {len(utts)} utts, median TTFA "
              f"{float(np.median(ttfas)) * 1e3:.1f} ms, median "
              f"{float(np.median(rtfs)):.1f}x realtime -> {args.outdir}")
        return

    pipe = TTSPipeline(model, params, state, pwg_params, pwg_cfg,
                       sample_rate=args.sample_rate,
                       quantize=args.quantize)
    rtfs = []
    for i in range(0, len(utts), args.batch_size):
        chunk = utts[i:i + args.batch_size]
        rng, sub = jax.random.split(rng)
        wavs, stats = pipe.tts_batch([u.tokenids for u in chunk], sub)
        rtfs.append(stats["rtf_x"])
        for u, w in zip(chunk, wavs):
            write_wav(os.path.join(args.outdir, f"{u.uttid}.wav"), w,
                      args.sample_rate)
    print(f"synthesized {len(utts)} utts, median RTF "
          f"{float(np.median(rtfs)):.1f}x realtime -> {args.outdir}")


if __name__ == "__main__":
    main()
