#!/usr/bin/env python3
"""Vocode mel features (feats.scp from fcl_synth, or npy files) to wavs.

TPU-native replacement for the external `parallel-wavegan-decode` step
(/root/reference/inference_teacher.sh:20-23): runs the JAX PWG generator,
optionally with official pretrained weights (--checkpoint PWG.pkl).
"""

import argparse
import os
import sys
import wave as wavemod

import numpy as np


def write_wav(path, x, sr):
    x = np.clip(x, -1.0, 1.0)
    pcm = (x * 32767.0).astype(np.int16)
    with wavemod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feats-scp", type=str, required=True)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="official ParallelWaveGAN .pkl (random init if "
                        "omitted — for smoke runs only)")
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", choices=["auto", "pallas", "xla"],
                   default="auto",
                   help="auto = fused streaming Pallas kernel on TPU, "
                        "exact chunked XLA elsewhere")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fcl_taco2_tpu.infer.ark import read_ark_matrix
    from fcl_taco2_tpu.utils.device import warmup_transfers
    from fcl_taco2_tpu.vocoder.pwg import (PWGConfig, load_pwg_checkpoint,
                                           pwg_init)

    cfg = PWGConfig()
    if args.checkpoint:
        params = load_pwg_checkpoint(args.checkpoint, cfg)
    else:
        print("WARNING: no --checkpoint; using random weights (noise out)")
        params = jax.jit(lambda k: pwg_init(k, cfg))(
            jax.random.PRNGKey(args.seed))
    warmup_transfers()

    os.makedirs(args.outdir, exist_ok=True)
    # best vocode path (fused streaming Pallas on TPU, chunked XLA
    # elsewhere — results/PWG_vocoder.json); mel lengths are bucketed so
    # the jit cache stays small (remote compiles cost minutes)
    from fcl_taco2_tpu.vocoder.pwg_pallas import vocode
    gen = jax.jit(lambda p, m, n: vocode(p, cfg, m, n,
                                         backend=args.backend))
    key = jax.random.PRNGKey(args.seed)
    with open(args.feats_scp) as f:
        entries = [line.split() for line in f.read().splitlines()]
    for uttid, pointer in entries:
        mel = read_ark_matrix(pointer)
        T = mel.shape[0]
        Tb = -(-T // 64) * 64  # length bucket
        mel_p = np.zeros((Tb, mel.shape[1]), np.float32)
        mel_p[:T] = mel
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (1, Tb * cfg.hop))
        wav = np.asarray(gen(params, jnp.asarray(mel_p[None]), noise))[0]
        write_wav(os.path.join(args.outdir, f"{uttid}.wav"),
                  wav[:T * cfg.hop], args.sample_rate)
    print(f"vocoded {len(entries)} utts -> {args.outdir}")


if __name__ == "__main__":
    main()
