"""Streaming text->wav TTS: incremental mel decode + stateful vocoder.

Time-to-first-audio pipeline with NO reference counterpart (the reference
synthesizes whole utterances, then vocodes them in a separate process,
/root/reference/tts.py:605-687 + inference script stage 2) — this is the
TPU-native payoff of the FCL architecture: phoneme segments decode
INDEPENDENTLY (frame-level parallelism, e2e_tts_tacotron2_sa.py:
decoder called per phoneme segment), so mel can be produced in phoneme
chunks, and the causal streaming PWG kernel (vocoder/pwg_pallas.py)
carries its ring-buffer state across calls, so audio leaves the chip a
fixed ~total_delay/sr (~139 ms) behind the first decoded frame.

Pipeline (host-driven; every stage one jitted call with static shapes):

    frontend (whole text, cheap)      -> hs, durations       [1 readback]
    per chunk of `chunk_phonemes`:
      decode_segments -> scatter into a device mel ring       (exact: FCL)
      postnet over `postnet_chunk`-frame windows with
        +-ctx_post real-frame context; per-window seq_mask
        reproduces the full graph's per-layer masking          (exact)
      upsample `vocode_frames`-frame windows with +-cu frame
        context (all upsample convs are bias-free, so the
        zero rows outside [0, F) reproduce 'same' padding)     (exact)
      pwg_stream_step over Vh = vocode_frames*hop samples      (exact)

Chaining is bit-identical (fp reassociation only) to
``synthesize`` + ``pwg_generate`` over the whole utterance when the
model is deterministic (dropout 0); with prenet dropout active the
draws differ chunk-to-chunk but are iid — statistically the same
stochastic inference as the reference (decoder_sa.py:109-112).
Tested in tests/test_stream.py.
"""

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models.taco2_sa import Tacotron2SA, _cast_floats
from fcl_taco2_tpu.models.decoder import apply_postnet_inference
from fcl_taco2_tpu.vocoder.pwg import PWGConfig
from fcl_taco2_tpu.vocoder.pwg_pallas import (pack_pwg_weights,
                                              pwg_stream_state,
                                              pwg_stream_step, total_delay,
                                              _round8)


def _round_up(x, m):
    return -(-x // m) * m


class StreamTTS:
    """Chunked streaming synthesis for ONE utterance at a time (B=1).

    Args:
        model/params/state: acoustic model (Tacotron2SA pytrees).
        pwg_params/pwg_cfg: Parallel-WaveGAN generator.
        chunk_phonemes: phoneme segments decoded per step (static shape).
        postnet_chunk: frames refined per postnet window.
        vocode_frames: mel frames consumed per vocoder call; the call
            emits ``vocode_frames * hop`` samples and must be a multiple
            of ``tile`` samples.
        tile: Pallas sample tile (8-aligned; 1024 on real TPU).
        interpret: run the vocoder kernel in interpret mode (default:
            auto — True off-TPU so CPU tests work).
    """

    def __init__(self, model: Tacotron2SA, params, state, pwg_params,
                 pwg_cfg: PWGConfig, chunk_phonemes: int = 16,
                 postnet_chunk: int = 64, vocode_frames: int = 16,
                 tile: int = 1024, interpret: Optional[bool] = None,
                 budget_round: int = 256,
                 decoder_backend: str = "auto",
                 readback_depth: int = 1,
                 quantize: str = "none"):
        self.model = model
        self.cfg = model.cfg
        self.params = params
        self.state = state
        self.pwg_cfg = pwg_cfg
        self.pwg_params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
            else jnp.asarray(x), pwg_params)
        self.packed = pack_pwg_weights(self.pwg_params, pwg_cfg)
        self.Pc = int(chunk_phonemes)
        self.Fc = int(postnet_chunk)
        self.Fv = int(vocode_frames)
        self.hop = pwg_cfg.hop
        self.Vh = self.Fv * self.hop
        # small-hop configs (tests, compact vocoders) get a whole-call
        # tile; 1024 is the measured sweet spot for the full-size PWG
        self.tile = min(int(tile), self.Vh)
        if self.Vh % self.tile:
            raise ValueError(
                f"vocode_frames*hop ({self.Vh}) must be a multiple of "
                f"tile ({self.tile})")
        self.delay = _round8(total_delay(pwg_cfg))
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)
        self.decoder_backend = decoder_backend
        # int8 weight-only streaming decode: the phoneme chunks are a
        # single kernel tile, exactly where the weight-streaming kernel's
        # DMA bound dominates — int8 halves it (Tacotron2SA.synthesize).
        # Codes are prepared ONCE: inline quantization would re-read
        # ~50 MB of weights on EVERY chunk, rivaling the chunk decode.
        self.quantize = quantize
        self.prequant = None
        if decoder_backend in ("auto", "pallas_hbm", "hybrid"):
            from fcl_taco2_tpu.ops.decoder_pallas import maybe_prequantize
            self.prequant = maybe_prequantize(model.cfg,
                                              params["decoder"], quantize)
        self.budget_round = int(budget_round)
        # wav chunks whose D2H readback may lag their dispatch; adds
        # depth*Vh/sr of buffering latency after the FIRST chunk, hides
        # the transfer RTT behind the next steps' compute (0 = fully
        # synchronous)
        self.readback_depth = max(0, int(readback_depth))
        # context margins (frames): postnet receptive field, and the
        # upsampler's (conv_in +-aux_context_window, then each smoothing
        # conv adds < 1 frame at the final rate — bound by len(scales))
        cfgm = self.cfg
        self.ctx_post = cfgm.postnet_layers * (cfgm.postnet_filts // 2)
        self.cu = (pwg_cfg.aux_context_window
                   + len(pwg_cfg.upsample_scales) + 1)
        # leading zero margin shared by all windows; trailing margin must
        # also cover the vocoder tail (delay/hop frames past F)
        self.pad = _round_up(max(self.ctx_post, self.cu, 1), 8)
        self.tail = _round_up(
            self.pad + -(-self.delay // self.hop) + self.Fv + self.Fc, 8)
        self._jit_frontend = jax.jit(self._frontend_pred)
        self._jit_frontend_dur = jax.jit(self._frontend_dur)
        self._jit_decode = jax.jit(self._decode_chunk)
        self._jit_postnet = jax.jit(self._postnet_chunk)
        self._jit_vocode = jax.jit(self._vocode_step)
        self._jit_vocode_noise = jax.jit(self._vocode_step_noise)

    # ---------------- jitted stages ----------------

    def _frontend_pred(self, params, state, tokens, ilens, d_factor):
        hs, d_outs, _, _ = self.model.synth_frontend(
            params, state, tokens, ilens, d_factor=d_factor)
        return hs, d_outs

    def _frontend_dur(self, params, state, tokens, ilens, durations,
                      d_factor):
        hs, d_outs, _, _ = self.model.synth_frontend(
            params, state, tokens, ilens, durations=durations,
            d_factor=d_factor)
        return hs, d_outs

    def _decode_chunk(self, params, state, hs, tok_idx, dur, position,
                      mask, seg_start, key, k_idx, mel_buf):
        """AR-decode Pc phoneme segments, scatter into the mel buffer.

        mel_buf: (Lbuf+1, odim) in compute dtype; row Lbuf is the drop
        slot (mirrors synthesize's scatter, models/taco2_sa.py)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if dtype != jnp.float32:
            params = _cast_floats(params, dtype)
        key = jax.random.fold_in(key, k_idx)  # in-jit: no eager dispatch
        enc_seg = hs[0][tok_idx]                      # (Pc, adim)
        # ragged bounds: the chunk's AR loops stop at its true max
        # duration instead of the static max_dur cap (mean durations are
        # ~8 vs cap 50), directly cutting time-to-first-audio; chunks are
        # small so no sorting is needed (usually a single kernel tile)
        from fcl_taco2_tpu.ops.decoder_pallas import tile_step_bounds
        seg_out = self.model.decode_segments(
            params, state, enc_seg, dur, position.astype(dtype), mask,
            key, decoder_backend=self.decoder_backend,
            tile_bounds=tile_step_bounds(dur),
            step_bound=dur.max(), quantize=self.quantize,
            prequant=self.prequant)
        D = mask.shape[1]
        frame_pos = seg_start[:, None] + jnp.arange(D, dtype=jnp.int32)
        Lbuf = mel_buf.shape[0] - 1
        tgt = jnp.where(mask, self.pad + frame_pos, Lbuf)
        return mel_buf.at[tgt.reshape(-1)].set(
            seg_out.reshape(-1, cfg.odim).astype(mel_buf.dtype),
            mode="drop")

    def _postnet_chunk(self, params, state, mel_buf, after_buf, p0, F):
        """Refine frames [p0, p0+Fc) given +-ctx_post real context.

        The per-window seq_mask (0 <= global pos < F) reproduces the
        full graph's per-layer masking (components.postnet_apply), so
        the window center is bit-identical to the whole-utterance
        postnet."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if dtype != jnp.float32:
            params = _cast_floats(params, dtype)
        ctx, Fc = self.ctx_post, self.Fc
        win = jax.lax.dynamic_slice(
            mel_buf, (self.pad + p0 - ctx, 0), (Fc + 2 * ctx, cfg.odim))
        gpos = p0 - ctx + jnp.arange(Fc + 2 * ctx, dtype=jnp.int32)
        mask = (gpos >= 0) & (gpos < F)
        after = apply_postnet_inference(
            params["decoder"], state["decoder"], cfg, win[None],
            seq_mask=mask[None])
        after = after * mask[None, :, None].astype(after.dtype)
        center = after[0, ctx:ctx + Fc].astype(jnp.float32)
        return jax.lax.dynamic_update_slice(
            after_buf, center, (self.pad + p0, 0))

    def _upsample_window(self, win, f0, F):
        """Windowed ConvInUpsampleNetwork, exact vs the full graph.

        ``win`` holds frames [f0-cu, f0-cu+Fw); rows outside [0, F) are
        zero in the buffer, but each stage's conv smears real values
        INTO them — in the full graph those positions are implicit
        'same' zero padding at EVERY stage, so re-mask to the stage's
        valid range [0, F*rate) after each conv (mirror of the postnet's
        per-layer seq_mask; all upsample convs are bias-free)."""
        from fcl_taco2_tpu.ops.conv import conv1d
        pwg = self.pwg_cfg
        Fw = win.shape[0]
        lo = f0 - self.cu
        x = conv1d(win[None], self.pwg_params["conv_in"]["kernel"])
        gpos = lo + jnp.arange(Fw, dtype=jnp.int32)
        x = x * ((gpos >= 0) & (gpos < F))[None, :, None].astype(x.dtype)
        A = x.shape[-1]
        rate = 1
        for scale, up in zip(pwg.upsample_scales,
                             self.pwg_params["upsample"]):
            x = jnp.repeat(x, scale, axis=1)
            rate *= scale
            taps = up["kernel"][0, 0, :, 0]
            w = jnp.tile(taps[:, None, None], (1, 1, A))
            p = (taps.shape[0] - 1) // 2
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=[(p, p)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=A)
            gpos = lo * rate + jnp.arange(Fw * rate, dtype=jnp.int32)
            x = x * ((gpos >= 0) & (gpos < F * rate))[None, :, None] \
                .astype(x.dtype)
        return x  # (1, Fw*hop, A)

    def _vocode_core(self, after_buf, j, F, noise):
        f0 = j * self.Fv
        win = jax.lax.dynamic_slice(
            after_buf, (self.pad + f0 - self.cu, 0),
            (self.Fv + 2 * self.cu, self.cfg.odim))
        aux = self._upsample_window(win, f0, F)
        aux = aux[:, self.cu * self.hop:self.cu * self.hop + self.Vh]
        W = F * self.hop
        return aux, f0 * self.hop, W, noise

    def _vocode_step(self, vstate, after_buf, j, F, key):
        key = jax.random.fold_in(key, j)  # in-jit: no eager dispatch
        noise = jax.random.normal(key, (1, self.Vh), jnp.float32)
        aux, start, W, noise = self._vocode_core(after_buf, j, F, noise)
        return pwg_stream_step(self.packed, self.pwg_cfg, vstate, aux,
                               noise, start, W, tile=self.tile,
                               interpret=self.interpret)

    def _vocode_step_noise(self, vstate, after_buf, j, F, noise):
        aux, start, W, noise = self._vocode_core(after_buf, j, F, noise)
        return pwg_stream_step(self.packed, self.pwg_cfg, vstate, aux,
                               noise, start, W, tile=self.tile,
                               interpret=self.interpret)

    # ---------------- host-driven stream ----------------

    def stream(self, tokens, rng, d_factor: float = 1.0, durations=None,
               noise=None):
        """Generator: yields fp32 wav chunks (np.ndarray) as synthesized.

        Args:
            tokens: (T,) int token ids (no padding).
            rng: jax PRNGKey (decoder prenet dropout + vocoder noise).
            durations: optional (T,) int ground-truth durations.
            noise: optional (>= F*hop,) fp32 vocoder noise (tests /
                reproducibility); default iid normal generated on device.

        Total yielded samples = sum(durations)*hop, bit-identical
        (modulo fp reassociation) to synthesize+pwg_generate when the
        acoustic model is deterministic.
        """
        cfg = self.cfg
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        T = tokens.shape[0]
        Tb = _round_up(max(T, 1), 8)
        tok_pad = np.zeros((1, Tb), np.int32)
        tok_pad[0, :T] = tokens
        ilens = jnp.asarray([T], jnp.int32)
        k_front, k_dec, k_noise = jax.random.split(rng, 3)
        del k_front
        if durations is None:
            hs, d_outs = self._jit_frontend(
                self.params, self.state, jnp.asarray(tok_pad), ilens,
                jnp.float32(d_factor))
        else:
            dur_pad = np.zeros((1, Tb), np.int32)
            dur_pad[0, :T] = np.asarray(durations, np.int32)
            hs, d_outs = self._jit_frontend_dur(
                self.params, self.state, jnp.asarray(tok_pad), ilens,
                jnp.asarray(dur_pad), jnp.float32(d_factor))
        dur = np.asarray(d_outs)[0, :T].astype(np.int64)  # 1 small D2H
        F = int(dur.sum())
        if F == 0:
            return
        D = cfg.max_dur
        Pc, Fc, Fv = self.Pc, self.Fc, self.Fv
        budget = _round_up(F, self.budget_round)
        Lbuf = self.pad + budget + self.tail
        dtype = jnp.dtype(cfg.compute_dtype)
        mel_buf = jnp.zeros((Lbuf + 1, cfg.odim), dtype)
        after_buf = jnp.zeros((Lbuf, cfg.odim), jnp.float32)
        vstate = pwg_stream_state(self.pwg_cfg, 1)

        starts = np.concatenate([[0], np.cumsum(dur)])[:-1]
        Wtot = F * self.hop
        n_chunks = -(-T // Pc)
        n_vsteps = -(-(Wtot + self.delay) // self.Vh)
        if noise is not None:
            noise = np.asarray(noise, np.float32).reshape(-1)
            if noise.shape[0] < Wtot:
                raise ValueError(
                    f"noise has {noise.shape[0]} samples < F*hop={Wtot}")
            noise = np.pad(noise[:Wtot],
                           (0, n_vsteps * self.Vh - Wtot))

        posted = 0    # frames through the postnet
        j = 0         # vocoder step index
        pending = []  # (step, device wav) not yet read back: dispatch
                      # runs ahead of D2H so transfer latency (the axon
                      # relay RTT) overlaps the next steps' compute

        def _vocode_ready():
            return (j < n_vsteps
                    and ((j + 1) * Fv + self.cu <= posted
                         or posted >= F))

        def _run_vocode(vstate):
            if noise is None:
                wav, vstate = self._jit_vocode(
                    vstate, after_buf, jnp.int32(j), jnp.int32(F),
                    k_noise)
            else:
                nz = jnp.asarray(
                    noise[j * self.Vh:(j + 1) * self.Vh][None])
                wav, vstate = self._jit_vocode_noise(
                    vstate, after_buf, jnp.int32(j), jnp.int32(F), nz)
            try:
                # start the D2H at dispatch so queued readbacks overlap
                # (on the relay each blocking transfer costs a full RTT)
                wav.copy_to_host_async()
            except AttributeError:
                pass
            return wav, vstate

        def _emit(jj, wav):
            lo = max(jj * self.Vh, self.delay)
            hi = min((jj + 1) * self.Vh, self.delay + Wtot)
            if hi > lo:
                out = np.asarray(wav)[0, lo - jj * self.Vh:
                                      hi - jj * self.Vh]
                if out.size:
                    return out
            return None

        for k in range(n_chunks):
            p_lo = k * Pc
            idx = np.arange(p_lo, p_lo + Pc)
            valid = idx < T
            idx_c = np.where(valid, np.minimum(idx, T - 1), 0)
            dur_c = np.where(valid, dur[idx_c], 0).astype(np.int32)
            st_c = np.where(valid, starts[idx_c], 0).astype(np.int32)
            d_range = np.arange(D, dtype=np.int32)[None, :]
            mask_c = d_range < dur_c[:, None]
            pos_c = np.where(
                mask_c,
                d_range.astype(np.float32)
                / np.maximum(dur_c[:, None], 1).astype(np.float32), 0.0)
            mel_buf = self._jit_decode(
                self.params, self.state, hs, jnp.asarray(idx_c),
                jnp.asarray(dur_c), jnp.asarray(pos_c),
                jnp.asarray(mask_c), jnp.asarray(st_c),
                k_dec, jnp.int32(k), mel_buf)
            dec_f = F if k == n_chunks - 1 else int(
                dur[:min((k + 1) * Pc, T)].sum())
            # postnet: window needs ctx_post future frames; at stream
            # end everything past F is zero-masked so no wait needed
            while (posted + Fc + self.ctx_post <= dec_f
                   or (dec_f >= F and posted < F)):
                after_buf = self._jit_postnet(
                    self.params, self.state, mel_buf, after_buf,
                    jnp.int32(posted), jnp.int32(F))
                posted += Fc
            while _vocode_ready():
                wav, vstate = _run_vocode(vstate)
                pending.append((j, wav))
                j += 1
                while len(pending) > self.readback_depth:
                    out = _emit(*pending.pop(0))
                    if out is not None:
                        yield out
        while j < n_vsteps:
            wav, vstate = _run_vocode(vstate)
            pending.append((j, wav))
            j += 1
            while len(pending) > self.readback_depth:
                out = _emit(*pending.pop(0))
                if out is not None:
                    yield out
        for item in pending:
            out = _emit(*item)
            if out is not None:
                yield out

    def tts(self, tokens, rng, **kw):
        """Convenience: run the stream to completion, return (F*hop,)."""
        chunks = list(self.stream(tokens, rng, **kw))
        if not chunks:
            return np.zeros((0,), np.float32)
        return np.concatenate(chunks)
