#!/usr/bin/env python3
"""Benchmark: fused Pallas AR decoder vs plain lax.scan on the real TPU.

SURVEY.md §7 item 8: keep the kernel only if it beats the XLA scan."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models.config import student_config, teacher_config
from fcl_taco2_tpu.models.decoder import decoder_inference, decoder_init
from fcl_taco2_tpu.ops.decoder_pallas import fused_ar_decode
from fcl_taco2_tpu.utils.device import warmup_transfers


def bench(cfg, name, P=128, dropout=0.5, n=30):
    D = cfg.max_dur
    params, state = jax.jit(
        lambda k: decoder_init(k, cfg))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    enc_seg = jnp.asarray(rng.normal(size=(P, cfg.eunits)).astype(
        np.float32))
    dur = np.clip(rng.poisson(8, P), 1, D).astype(np.int32)
    frame_mask = jnp.asarray(np.arange(D)[None, :] < dur[:, None])
    position = jnp.asarray(np.where(
        np.asarray(frame_mask),
        np.arange(D)[None, :] / np.maximum(dur[:, None], 1),
        0.0).astype(np.float32))

    scan = jax.jit(lambda p, s, e, d, pos, fm, k: decoder_inference(
        p, s, cfg, e, d, pos, fm, k))
    out = scan(params, state, enc_seg, jnp.asarray(dur), position,
               frame_mask, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = scan(params, state, enc_seg, jnp.asarray(dur), position,
                   frame_mask, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    t_scan = (time.perf_counter() - t0) / n

    fused = jax.jit(lambda p, e, pos, s: fused_ar_decode(
        p, e, pos, s, zoneout=cfg.zoneout_rate, dropout=dropout))
    outf = fused(params, enc_seg, position, 0)
    jax.block_until_ready(outf)
    t0 = time.perf_counter()
    for i in range(n):
        outf = fused(params, enc_seg, position, i)
    jax.block_until_ready(outf)
    t_fused = (time.perf_counter() - t0) / n

    print(f"{name}: P={P} D={D} scan={t_scan * 1e3:.3f}ms "
          f"fused={t_fused * 1e3:.3f}ms speedup={t_scan / t_fused:.2f}x")
    return t_scan, t_fused


if __name__ == "__main__":
    warmup_transfers()
    for P in (128, 512, 2048):
        bench(student_config(idim=70), "student", P=P)
    for P in (128, 512):
        bench(teacher_config(idim=70), "teacher", P=P)
