"""End-to-end TTS pipeline: phonemes -> mel (FCL-taco2) -> wav (PWG).

The reference runs the vocoder as a SEPARATE process over kaldi ark files
(inference_teacher.sh:20-23); here acoustic model + vocoder run as one
fused device pipeline (BASELINE.json config: "End-to-end streaming TTS:
student + Parallel-WaveGAN vocoder, batched multi-utterance").

Also provides chunked vocoding: PWG is non-causal but has a finite
receptive field, so a mel stream can be vocoded in chunks with
receptive-field context margins — constant latency/memory, bit-identical
to full-utterance vocoding in the interior (tested).
"""

import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models.taco2_sa import Tacotron2SA
from fcl_taco2_tpu.vocoder.pwg import PWGConfig, pwg_generate


def pwg_receptive_field(cfg: PWGConfig):
    """One-sided receptive field in samples of the PWG conv stack."""
    rf = 0
    for d in cfg.dilations:
        rf += (cfg.kernel_size - 1) // 2 * d
    # upsample smoothing convs + conv_in act on the mel grid
    rf_mel = cfg.aux_context_window + sum(s for s in cfg.upsample_scales)
    return rf + rf_mel * cfg.hop


class TTSPipeline:
    def __init__(self, model: Tacotron2SA, params, state, pwg_params,
                 pwg_cfg: Optional[PWGConfig] = None, sample_rate=22050,
                 pwg_dtype="bfloat16", quantize="none"):
        self.model = model
        self.pwg_cfg = pwg_cfg or PWGConfig()
        self.pwg_dtype = jnp.dtype(pwg_dtype)
        # int8 weight-only quantized decode (Tacotron2SA.synthesize);
        # effective where the decode rides the weight-streaming kernel.
        # Codes prepared once — the inline path re-reads ~50 MB/call.
        self.quantize = quantize
        from fcl_taco2_tpu.ops.decoder_pallas import maybe_prequantize
        self.prequant = maybe_prequantize(model.cfg, params["decoder"],
                                          quantize)
        from fcl_taco2_tpu.utils.device import device_put_via_jit as put
        self.params = put(params)
        self.state = put(state)
        self.pwg_params = put(pwg_params)
        self.sample_rate = sample_rate
        self._jitted = {}
        from fcl_taco2_tpu.utils.device import warmup_transfers
        warmup_transfers()

    def _fn(self, B, Tmax, budget):
        key = (B, Tmax, budget)
        if key not in self._jitted:
            hop = self.pwg_cfg.hop

            def fn(params, state, pwg_params, tokens, ilens, key):
                k1, k2 = jax.random.split(key)
                out = self.model.synthesize(params, state, tokens, ilens,
                                            k1, frame_budget=budget,
                                            quantize=self.quantize,
                                            prequant=self.prequant)
                dt = self.pwg_dtype
                pwg_p = jax.tree_util.tree_map(
                    lambda x: x.astype(dt), pwg_params)
                noise = jax.random.normal(k2, (B, budget * hop), dt)
                # best vocode path: fused streaming Pallas kernel on TPU
                # (3.4-10x the XLA graph, results/PWG_vocoder.json),
                # exact receptive-field chunking elsewhere — both bound
                # activation memory for long budgets
                from fcl_taco2_tpu.vocoder.pwg_pallas import vocode
                wav = vocode(pwg_p, self.pwg_cfg,
                             out["mel"].astype(dt), noise)
                return (wav.astype(jnp.float32), out["olens"] * hop,
                        out["olens"])

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def tts_batch(self, token_lists: List[np.ndarray], rng,
                  frame_per_token=16):
        """Batched text->wav; returns (wavs, stats with RTF)."""
        B = len(token_lists)
        Tmax = max(len(t) for t in token_lists)
        Tmax = (Tmax + 15) // 16 * 16
        budget = ((Tmax * frame_per_token) + 255) // 256 * 256
        tokens = np.zeros((B, Tmax), np.int32)
        ilens = np.zeros(B, np.int32)
        for i, t in enumerate(token_lists):
            tokens[i, :len(t)] = t
            ilens[i] = len(t)
        warm = (B, Tmax, budget) not in self._jitted
        fn = self._fn(B, Tmax, budget)
        args = (self.params, self.state, self.pwg_params,
                jnp.asarray(tokens), jnp.asarray(ilens), rng)
        if warm:  # exclude compile from the RTF metric, but only once —
            # re-running every call would double production compute
            jax.block_until_ready(fn(*args)[0])
        t0 = time.perf_counter()
        wav, wav_lens, olens = fn(*args)
        wav = np.asarray(wav)
        wav_lens = np.asarray(wav_lens)
        wall = time.perf_counter() - t0
        wavs = [wav[i, :wav_lens[i]] for i in range(B)]
        audio_sec = float(wav_lens.sum()) / self.sample_rate
        return wavs, {"wall_sec": wall, "audio_sec": audio_sec,
                      "rtf_x": audio_sec / wall if wall > 0 else float("inf"),
                      "frames": int(np.asarray(olens).sum())}


def vocode_chunked(pwg_params, pwg_cfg: PWGConfig, mel, noise,
                   chunk_frames=64, context_frames=None):
    """Vocode a (T, n_mels) mel in chunks with receptive-field context.

    Yields wav chunks of chunk_frames*hop samples; concatenated output
    matches full-utterance vocoding in the interior of each chunk."""
    hop = pwg_cfg.hop
    if context_frames is None:
        context_frames = -(-pwg_receptive_field(pwg_cfg) // hop) + 1
    T = mel.shape[0]
    gen = jax.jit(lambda p, m, n: pwg_generate(p, pwg_cfg, m, n))
    for start in range(0, T, chunk_frames):
        end = min(start + chunk_frames, T)
        a = max(0, start - context_frames)
        b = min(T, end + context_frames)
        m = mel[a:b][None]
        n = noise[a * hop:b * hop][None]
        wav = np.asarray(gen(pwg_params, jnp.asarray(m),
                             jnp.asarray(n)))[0]
        yield wav[(start - a) * hop:(end - a) * hop]
