"""Parallel WaveGAN generator in JAX (mel -> waveform).

The reference vocodes with the external kan-bayashi/ParallelWaveGAN CUDA
package as a separate CLI (/root/reference/inference_teacher.sh:20-23,
vocoder/PWG/PWG.pkl).  This is a TPU-native generator with the same
architecture (v1 config), so synthesis + vocoding fuse into one device
pipeline; ``import_pwg_state_dict`` maps the official package's checkpoint
layout onto these params so pretrained PWG weights can be reused.

Architecture (WaveNet-style non-causal, non-autoregressive):
    noise (B, T, 1) -> first 1x1 conv -> [30 residual blocks: dilated conv
    (gated tanh/sigmoid) + mel-conditioning 1x1 -> residual/skip 1x1] ->
    sum(skips) * sqrt(1/30) -> relu -> 1x1 -> relu -> 1x1 -> wav (B, T)
    mel conditioning: conv_in (context window) then nearest-neighbour
    stretch x4 four times, each followed by a (1, 2*scale+1) smoothing conv.

Everything is feed-forward convs — MXU-heavy, single jit, batched.
"""

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import random

from fcl_taco2_tpu.ops.conv import conv1d
from fcl_taco2_tpu.utils import initializers as init


@dataclasses.dataclass(frozen=True)
class PWGConfig:
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 3
    upsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    aux_context_window: int = 2

    @property
    def hop(self):
        return int(np.prod(self.upsample_scales))

    @property
    def dilations(self):
        per_stack = self.layers // self.stacks
        return [2 ** (i % per_stack) for i in range(self.layers)]


def _conv_init(key, shape):
    k1, k2 = random.split(key)
    w = init.conv_kernel_torch(k1, shape)
    b = init.conv_bias_torch(shape[1], shape[0])(k2, (shape[2],))
    return {"kernel": w, "bias": b}


def pwg_init(key, cfg: PWGConfig):
    keys = random.split(key, 4 + 4 * cfg.layers + len(cfg.upsample_scales))
    ki = iter(keys)
    params = {
        "first_conv": _conv_init(next(ki), (1, 1, cfg.residual_channels)),
        "conv_in": {"kernel": init.conv_kernel_torch(
            next(ki), (2 * cfg.aux_context_window + 1, cfg.aux_channels,
                       cfg.aux_channels))},
        "upsample": [
            {"kernel": jnp.full((1, 1, 2 * s + 1, 1), 1.0 / (2 * s + 1),
                                jnp.float32)}
            for s in cfg.upsample_scales],
        "blocks": [],
        "last1": _conv_init(next(ki), (1, cfg.skip_channels,
                                       cfg.skip_channels)),
        "last2": _conv_init(next(ki), (1, cfg.skip_channels, 1)),
    }
    for _ in range(cfg.layers):
        params["blocks"].append({
            "conv": _conv_init(next(ki), (cfg.kernel_size,
                                          cfg.residual_channels,
                                          cfg.gate_channels)),
            "aux": {"kernel": init.conv_kernel_torch(
                next(ki), (1, cfg.aux_channels, cfg.gate_channels))},
            "out": _conv_init(next(ki), (1, cfg.gate_channels // 2,
                                         cfg.residual_channels)),
            "skip": _conv_init(next(ki), (1, cfg.gate_channels // 2,
                                          cfg.skip_channels)),
        })
    return params


def _dilated_conv(x, kernel, bias, dilation):
    width = kernel.shape[0]
    pad = (width - 1) // 2 * dilation
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"))
    return out + bias


def upsample_mel(params, cfg: PWGConfig, mel):
    """(B, T, aux) -> (B, T*hop, aux): context conv + stretch/smooth chain.

    Matches kan-bayashi ConvInUpsampleNetwork: conv_in (no bias) then per
    scale nearest-stretch + (2s+1)-tap smoothing (no bias).  The smoothing
    kernel is identical for every mel channel, so it runs as a DEPTHWISE
    1D conv over (B, W, aux) — the earlier NCHW conv2d formulation drove
    XLA into a pathological padded layout at batch > 1."""
    x = conv1d(mel, params["conv_in"]["kernel"])  # (B, T, A)
    A = x.shape[-1]
    for scale, up in zip(cfg.upsample_scales, params["upsample"]):
        x = jnp.repeat(x, scale, axis=1)  # nearest stretch along time
        k = up["kernel"]  # (1, 1, 2s+1, 1): taps along dim 2
        taps = k[0, 0, :, 0]
        w = jnp.tile(taps[:, None, None], (1, 1, A))  # (2s+1, 1, A)
        pad = (taps.shape[0] - 1) // 2
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=A)
    return x  # (B, T*hop, aux)


def pwg_generate(params, cfg: PWGConfig, mel, noise):
    """mel (B, T, aux), noise (B, T*hop) -> wav (B, T*hop)."""
    aux = upsample_mel(params, cfg, mel)
    x = noise[..., None]  # (B, N, 1)
    x = conv1d(x, params["first_conv"]["kernel"],
               params["first_conv"]["bias"])
    skips = 0.0
    half = cfg.gate_channels // 2
    for block, dilation in zip(params["blocks"], cfg.dilations):
        residual = x
        h = _dilated_conv(x, block["conv"]["kernel"], block["conv"]["bias"],
                          dilation)
        h = h + conv1d(aux, block["aux"]["kernel"])
        ha, hb = h[..., :half], h[..., half:]
        h = jnp.tanh(ha) * jax.nn.sigmoid(hb)
        s = conv1d(h, block["skip"]["kernel"], block["skip"]["bias"])
        x = conv1d(h, block["out"]["kernel"], block["out"]["bias"])
        x = (x + residual) * math.sqrt(0.5)
        skips = skips + s
    x = skips * math.sqrt(1.0 / cfg.layers)
    x = jax.nn.relu(x)
    x = conv1d(x, params["last1"]["kernel"], params["last1"]["bias"])
    x = jax.nn.relu(x)
    x = conv1d(x, params["last2"]["kernel"], params["last2"]["bias"])
    return x[..., 0]


def pwg_generate_chunked(params, cfg: PWGConfig, mel, noise,
                         chunk_frames=128, context_frames=40):
    """Memory-bounded vocoding: process mel in chunks with receptive-field
    context margins, sequentially under lax.map.

    Full-utterance PWG keeps ~30 layers of (T*hop, gate) activations alive
    (OOM for long budgets); chunking caps live activations at
    O(chunk + 2*context).  With context >= the receptive field the output
    equals full-utterance vocoding in the INTERIOR; the first/last
    ~receptive-field samples of the whole utterance follow a static-pad
    convention instead (the zero-noise pad region carries first_conv bias
    where the full graph's implicit 'same' padding is literal zeros) —
    a sub-millisecond, ~-45 dB edge effect.  The generator-style
    ``infer.pipeline.vocode_chunked`` clamps windows to the utterance and
    is edge-exact, at the cost of dynamic shapes.

    mel (B, T, aux), noise (B, T*hop) -> (B, T*hop).
    """
    B, T, A = mel.shape
    hop = cfg.hop
    n_chunks = -(-T // chunk_frames)
    Tp = n_chunks * chunk_frames
    c = context_frames
    mel_p = jnp.pad(mel, ((0, 0), (c, Tp - T + c), (0, 0)))
    noise_p = jnp.pad(noise, ((0, 0), (c * hop, (Tp - T + c) * hop)))

    starts = jnp.arange(n_chunks) * chunk_frames
    width = chunk_frames + 2 * c

    def one(start):
        m = jax.lax.dynamic_slice(mel_p, (0, start, 0), (B, width, A))
        n = jax.lax.dynamic_slice(noise_p, (0, start * hop),
                                  (B, width * hop))
        w = pwg_generate(params, cfg, m, n)
        return jax.lax.dynamic_slice(w, (0, c * hop),
                                     (B, chunk_frames * hop))

    chunks = jax.lax.map(one, starts)  # (n_chunks, B, chunk*hop)
    wav = jnp.swapaxes(chunks, 0, 1).reshape(B, Tp * hop)
    return wav[:, :T * hop]


# ----------------------------------------------------------------------
# official checkpoint import
# ----------------------------------------------------------------------

def import_pwg_state_dict(sd, cfg: PWGConfig):
    """Map a kan-bayashi ParallelWaveGANGenerator state dict (the
    'model'->'generator' entry of their .pkl checkpoints) onto our params."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}

    def conv(key):
        return np.ascontiguousarray(sd[key].transpose(2, 1, 0))

    params = {
        "first_conv": {"kernel": conv("first_conv.weight"),
                       "bias": sd["first_conv.bias"]},
        "conv_in": {"kernel": conv("upsample_net.conv_in.weight")},
        # up_layers = [Stretch2d, Conv2d] per scale (v1: no nonlinearity),
        # so the convs sit at odd indices; their kernel is (1,1,1,2s+1)
        # with time last — ours is (1,1,2s+1,1) with time in H
        "upsample": [
            {"kernel": np.ascontiguousarray(
                sd[f"upsample_net.upsample.up_layers.{2 * i + 1}.weight"]
                .transpose(0, 1, 3, 2))}
            for i in range(len(cfg.upsample_scales))],
        "blocks": [],
        "last1": {"kernel": conv("last_conv_layers.1.weight"),
                  "bias": sd["last_conv_layers.1.bias"]},
        "last2": {"kernel": conv("last_conv_layers.3.weight"),
                  "bias": sd["last_conv_layers.3.bias"]},
    }
    for i in range(cfg.layers):
        p = f"conv_layers.{i}"
        params["blocks"].append({
            "conv": {"kernel": conv(f"{p}.conv.weight"),
                     "bias": sd[f"{p}.conv.bias"]},
            "aux": {"kernel": conv(f"{p}.conv1x1_aux.weight")},
            "out": {"kernel": conv(f"{p}.conv1x1_out.weight"),
                    "bias": sd[f"{p}.conv1x1_out.bias"]},
            "skip": {"kernel": conv(f"{p}.conv1x1_skip.weight"),
                     "bias": sd[f"{p}.conv1x1_skip.bias"]},
        })
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_pwg_checkpoint(path, cfg: PWGConfig):
    """Load an official .pkl checkpoint: {'model': {'generator': sd}}."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload:
        payload = payload["model"]
    if isinstance(payload, dict) and "generator" in payload:
        payload = payload["generator"]
    return import_pwg_state_dict(payload, cfg)
