#!/usr/bin/env python3
"""Benchmark the PWG vocoder paths on the real TPU and record the result.

Paths:
- xla_full      : whole-utterance conv graph (OOM-prone past ~1k frames)
- xla_chunk128  : receptive-field chunked, exact (the serving default)
- pallas_stream : fused streaming kernel (vocoder/pwg_pallas.py) — fixed
                  ~139 ms latency, O(1) memory, weights VMEM-resident

Writes results/PWG_vocoder.json.  History note (recorded because it's the
actual optimization): the original NCHW conv2d mel-upsampling drove XLA
into a pathological padded layout — rewriting it as a depthwise NWC conv
sped the WHOLE XLA vocode path ~2.2-3x and fixed batch-8 HBM OOMs.
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

from fcl_taco2_tpu.vocoder.pwg import (PWGConfig, pwg_generate,
                                       pwg_generate_chunked, pwg_init)
from fcl_taco2_tpu.vocoder.pwg_pallas import pwg_generate_streaming
from fcl_taco2_tpu.utils.device import warmup_transfers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--out", type=str, default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "PWG_vocoder.json"))
    args = ap.parse_args(argv)

    warmup_transfers()
    cfg = PWGConfig()
    params = jax.jit(lambda k: pwg_init(k, cfg))(jax.random.PRNGKey(0))
    hop = cfg.hop
    T = args.frames
    paths = {
        "xla_full": jax.jit(
            lambda p, m, n: pwg_generate(p, cfg, m, n)),
        "xla_chunk128": jax.jit(
            lambda p, m, n: pwg_generate_chunked(p, cfg, m, n, 128, 40)),
        "pallas_stream_t1024": jax.jit(
            lambda p, m, n: pwg_generate_streaming(p, cfg, m, n,
                                                   tile=1024)),
    }
    rows = []
    for B in (1, 8):
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
        noise = jnp.asarray(
            rng.normal(size=(B, T * hop)).astype(np.float32))
        for name, fn in paths.items():
            row = {"path": name, "B": B, "frames": T}
            try:
                # reps INSIDE one jitted fori_loop (per-call dispatch over
                # the device relay costs ~30 ms — comparable to the work);
                # fresh noise per iteration so nothing is loop-hoisted,
                # completion forced by a REAL host readback
                # (jax.block_until_ready can return early over the relay)
                n_it = args.reps

                @jax.jit
                def loop(p, m, key, _fn=fn):
                    def body(i, c):
                        nz = jax.random.normal(
                            jax.random.fold_in(key, i), (B, T * hop))
                        return _fn(p, m, nz)[0, :8]
                    return jax.lax.fori_loop(0, n_it, body,
                                             jnp.zeros(8))

                out = loop(params, mel, jax.random.PRNGKey(0))
                np.asarray(out)  # compile + warm
                t0 = time.perf_counter()
                np.asarray(out)
                rtt = time.perf_counter() - t0
                per = []
                for rep in range(3):
                    t0 = time.perf_counter()
                    np.asarray(loop(params, mel,
                                    jax.random.PRNGKey(rep + 1)))
                    per.append(
                        (time.perf_counter() - t0 - rtt) / n_it)
                dt = float(np.median(per))
                sps = B * T * hop / dt
                row.update(ms=round(dt * 1e3, 1),
                           msamples_per_sec=round(sps / 1e6, 2),
                           x_realtime_total=round(sps / 22050, 1))
            except Exception as exc:
                row["error"] = f"{type(exc).__name__}: {str(exc)[:160]}"
            rows.append(row)
            print(json.dumps(row), flush=True)

    def best(path_prefix):
        v = [r.get("msamples_per_sec", 0) for r in rows
             if r["path"].startswith(path_prefix) and "error" not in r]
        return max(v) if v else None

    payload = {
        "protocol": {"sr": 22050, "hop": hop, "reps": args.reps,
                     "backend": jax.default_backend(),
                     "note": "run on an otherwise-idle chip — concurrent "
                             "training on the same chip skews kernels "
                             "hardest"},
        "rows": rows,
        "conclusion": (
            f"pallas_stream best {best('pallas')} Msamples/s vs xla best "
            f"{max(filter(None, [best('xla_full'), best('xla_chunk')]))} "
            "Msamples/s; the fused streaming kernel keeps all weights "
            "VMEM-resident (activations never touch HBM), adds fixed "
            "~139 ms latency + O(1) memory, and is the TPU serving "
            "default; XLA chunked remains the CPU/fallback path"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
