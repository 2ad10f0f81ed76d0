"""FCL-taco2 model assembly: encoder + variance adaptor + SA decoder + losses.

Reference: /root/reference/nets/teacher_training/e2e_tts_tacotron2_sa.py
(Tacotron2_sa): forward at :520-622 (L1+MSE mel before/after postnet +
log-duration MSE + pitch/energy MSE), inference at :624-683 (duration /
f0 / energy control-knob overrides).

TPU-first: one pure ``loss_fn`` suitable for jit/grad with donated params;
inference is a single jitted function — predicted durations never leave the
device (the utterance regroup plan is computed with cumsums + scatter instead
of the reference's host loops at :665-671 and decoder_sa.py:619-630).
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import random

from fcl_taco2_tpu.models import components as C
from fcl_taco2_tpu.models.config import ModelConfig
from fcl_taco2_tpu.models.decoder import (apply_postnet_inference,
                                          decoder_inference, decoder_init,
                                          decoder_teacher_forced,
                                          decoder_teacher_forced_classed)
from fcl_taco2_tpu.models.encoder import encoder_apply, encoder_init
from fcl_taco2_tpu.ops.masking import (lengths_to_non_pad_mask,
                                       lengths_to_pad_mask, masked_l1,
                                       masked_mse, weighted_l1, weighted_mse)
from fcl_taco2_tpu.ops.regroup import gather_segments, gather_token_vectors


def _concat_spemb(hs, spembs):
    """L2-normalize the speaker vector and concat per token
    (e2e_tts_tacotron2_sa.py:555-557)."""
    norm = spembs / jnp.maximum(
        jnp.linalg.norm(spembs, axis=-1, keepdims=True), 1e-12)
    norm = norm.astype(hs.dtype)
    return jnp.concatenate(
        [hs, jnp.broadcast_to(norm[:, None, :],
                              (hs.shape[0], hs.shape[1],
                               norm.shape[-1]))], axis=-1)


def _cast_floats(tree, dtype):
    """Cast float leaves to the compute dtype (bf16 policy: params stay
    fp32 in the optimizer; the cast inside the loss makes XLA run the
    matmuls on the MXU in bf16 while grads transpose back to fp32)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


class SegClass(NamedTuple):
    """One duration class's segment plan (ops/regroup.ClassPlan, minus the
    static dur_cap — the shapes carry it).  ``seg_classes`` holds a tuple
    of these when cfg.duration_classes is set."""

    seg_utt: Any       # (P_c,)
    seg_tok: Any       # (P_c,)
    seg_start: Any     # (P_c,)
    frame_mask: Any    # (P_c, D_c) bool
    position: Any      # (P_c, D_c) float32


class Batch(NamedTuple):
    """One training batch, all static-bucketed shapes (converter output)."""

    tokens: Any        # (B, Tmax) int32, PAD=0
    ilens: Any         # (B,)
    mel: Any           # (B, Lmax, odim)
    olens: Any         # (B,)
    durations: Any     # (B, Tmax) int32 frames per token
    f0: Any            # (B, Tmax, 1) phoneme-avg normalized log-F0
    energy: Any        # (B, Tmax, 1) phoneme-avg normalized energy
    # regroup plan (ops/regroup.build_plan); with duration classes the
    # flat seg_* / frame_mask / position fields are None and seg_classes
    # carries the per-class plans (utt_gather then indexes the
    # concatenated class flats, ops/regroup.ClassedPlan)
    seg_utt: Any       # (P,)
    seg_tok: Any       # (P,)
    seg_start: Any     # (P,)
    frame_mask: Any    # (P, D) bool
    position: Any      # (P, D) float32
    utt_gather: Any    # (B, Lmax) int32
    utt_mask: Any      # (B, Lmax) bool
    spembs: Any = None  # optional (B, spk_embed_dim) speaker embeddings
    seg_classes: Any = None  # optional tuple of SegClass


class Tacotron2SA:
    """Functional model: params/state pytrees + pure apply methods."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    # ---------------- init ----------------

    def init(self, key):
        cfg = self.cfg
        keys = random.split(key, 7)
        enc_p, enc_s = encoder_init(keys[0], cfg)
        dec_p, dec_s = decoder_init(keys[1], cfg)
        params = {
            "encoder": enc_p,
            "decoder": dec_p,
            "duration_predictor": C.variance_predictor_init(
                keys[2], cfg.dec_idim, cfg.duration_predictor_layers,
                cfg.duration_predictor_chans,
                cfg.duration_predictor_kernel_size),
        }
        state = {"encoder": enc_s, "decoder": dec_s}
        if cfg.use_fe_condition:
            params["pitch_predictor"] = C.variance_predictor_init(
                keys[3], cfg.dec_idim, cfg.pitch_predictor_layers,
                cfg.pitch_predictor_chans, cfg.pitch_predictor_kernel_size)
            params["energy_predictor"] = C.variance_predictor_init(
                keys[4], cfg.dec_idim, cfg.energy_predictor_layers,
                cfg.energy_predictor_chans, cfg.energy_predictor_kernel_size)
            params["pitch_embed"] = C.scalar_embed_init(
                keys[5], cfg.dec_idim, cfg.pitch_embed_kernel_size)
            params["energy_embed"] = C.scalar_embed_init(
                keys[6], cfg.dec_idim, cfg.energy_embed_kernel_size)
        return params, state

    # ---------------- shared front half ----------------

    def _encode_and_predict(self, params, state, batch, rng, train,
                            capture_kd=False):
        """Encoder + duration/pitch/energy predictors + prosody embeds.

        Mirrors e2e_tts_tacotron2_sa.py:552-583.
        """
        cfg = self.cfg
        k_enc, k_dur, k_p, k_e, k_pe, k_ee = random.split(rng, 6)
        Tmax = batch.tokens.shape[1]
        hs, enc_state, enc_kd = encoder_apply(
            params["encoder"], state["encoder"], cfg, batch.tokens,
            batch.ilens, k_enc, train, capture_kd=capture_kd)
        if cfg.spk_embed_dim:
            hs = _concat_spemb(hs, batch.spembs)
        pad_mask = lengths_to_pad_mask(batch.ilens, Tmax)

        d_outs = C.duration_predictor_apply(
            params["duration_predictor"], hs, pad_mask, k_dur,
            cfg.duration_predictor_dropout_rate, train)

        p_outs = e_outs = p_embs = e_embs = None
        if cfg.use_fe_condition:
            p_outs = C.variance_predictor_apply(
                params["pitch_predictor"], hs, pad_mask, k_p,
                cfg.pitch_predictor_dropout_rate, train)
            e_outs = C.variance_predictor_apply(
                params["energy_predictor"], hs, pad_mask, k_e,
                cfg.energy_predictor_dropout_rate, train)
            # embeds are computed from GROUND-TRUTH f0/energy at train time
            # (e2e_tts_tacotron2_sa.py:582-583); caller passes the tracks.
            p_embs = C.scalar_embed_apply(
                params["pitch_embed"], batch.f0, k_pe,
                cfg.pitch_embed_dropout_rate, train)
            e_embs = C.scalar_embed_apply(
                params["energy_embed"], batch.energy, k_ee,
                cfg.energy_embed_dropout_rate, train)
        return (hs, enc_state, enc_kd, pad_mask, d_outs, p_outs, e_outs,
                p_embs, e_embs)

    # ---------------- training forward ----------------

    def loss_fn(self, params, state, batch: Batch, rng, train=True,
                capture_kd=False):
        """Returns (loss, aux) with aux = (report dict, new_state, knowledge).

        Loss assembly parity: e2e_tts_tacotron2_sa.py:600-620
        (l1 + mse + duration + pitch + energy, all masked means).
        """
        cfg = self.cfg
        if capture_kd and cfg.elayers < 1:
            raise ValueError("capture_kd requires elayers >= 1 (the KD "
                             "encoder captures the BiLSTM output, "
                             "encoder_sa_kd.py:196)")
        dtype = jnp.dtype(cfg.compute_dtype)
        if dtype != jnp.float32:
            params = _cast_floats(params, dtype)
            batch = batch._replace(
                mel=batch.mel.astype(dtype), f0=batch.f0.astype(dtype),
                energy=batch.energy.astype(dtype),
                position=(None if batch.position is None
                          else batch.position.astype(dtype)),
                spembs=(None if batch.spembs is None
                        else batch.spembs.astype(dtype)),
                seg_classes=(None if batch.seg_classes is None else tuple(
                    sc._replace(position=sc.position.astype(dtype))
                    for sc in batch.seg_classes)))
        rng, k_dec = random.split(rng)
        (hs, enc_state, enc_kd, pad_mask, d_outs, p_outs, e_outs, p_embs,
         e_embs) = self._encode_and_predict(params, state, batch, rng, train,
                                            capture_kd)

        if cfg.use_fe_condition:
            hs_cond = hs + p_embs + e_embs  # decoder_sa.py:461-462
        else:
            hs_cond = hs
        if batch.seg_classes is not None:
            # duration-classed decoder: one scan per class, D_c steps each
            # (cfg.duration_classes; ops/regroup.ClassedPlan)
            class_inputs = tuple(
                (gather_token_vectors(hs_cond, sc.seg_utt, sc.seg_tok),
                 gather_segments(batch.mel, sc.seg_utt, sc.seg_start,
                                 sc.frame_mask),
                 sc.position)
                for sc in batch.seg_classes)
            after, before, dec_state, dec_kd = \
                decoder_teacher_forced_classed(
                    params["decoder"], state["decoder"], cfg, class_inputs,
                    batch.utt_gather, batch.utt_mask, k_dec, train,
                    capture_kd=capture_kd)
        else:
            enc_seg = gather_token_vectors(hs_cond, batch.seg_utt,
                                           batch.seg_tok)
            seg_targets = gather_segments(batch.mel, batch.seg_utt,
                                          batch.seg_start, batch.frame_mask)
            after, before, dec_state, dec_kd = decoder_teacher_forced(
                params["decoder"], state["decoder"], cfg, enc_seg,
                seg_targets, batch.position, batch.frame_mask,
                batch.utt_gather, batch.utt_mask, k_dec, train,
                capture_kd=capture_kd)

        # losses always in fp32 (mixed-precision safe accumulation)
        f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
        mel32 = f32(batch.mel)
        if cfg.use_masking or cfg.use_weighted_masking:
            out_mask = batch.utt_mask[..., None]
            if cfg.reduction_factor > 1:
                # reference drops the mod-r ground-truth tail before the mel
                # loss (e2e_tts_tacotron2_sa.py:595-599); as a mask: frames
                # past olens - olens % r don't count.  The weighted path
                # builds its mask from the SAME post-trim olens (the
                # reference updates olens at :596 before taco2_loss builds
                # masks at :61/:74), so the trim applies to both.
                olens_r = batch.olens - batch.olens % cfg.reduction_factor
                out_mask = out_mask & lengths_to_non_pad_mask(
                    olens_r, batch.mel.shape[1])[..., None]
        else:
            # use_masking=False: plain means over the padded buffers
            # (Tacotron2Loss with reduction='mean', :44-60). NOTE this is
            # padding-sensitive by definition — here the pad extent is the
            # static Lmax bucket rather than the reference's per-batch max.
            out_mask = None
        in_mask = ~pad_mask
        if cfg.use_weighted_masking:
            # use_weighted_masking: every utterance contributes equally
            # regardless of length (Tacotron2Loss:72-80).  n_valid counts
            # real utterances — the static batch axis may carry all-pad
            # ghost rows the reference's ys.size(0) never sees.
            n_valid = jnp.sum(batch.olens > 0).astype(jnp.float32)
            l1 = weighted_l1(f32(after), mel32, out_mask, n_valid) + \
                weighted_l1(f32(before), mel32, out_mask, n_valid)
            mse = weighted_mse(f32(after), mel32, out_mask, n_valid) + \
                weighted_mse(f32(before), mel32, out_mask, n_valid)
            # the reference's weighted duration path is latent-broken: with
            # reduction='none' DurationPredictorLoss returns an unreduced
            # vector that crashes at duration_loss.item()
            # (e2e_tts_tacotron2_sa.py:563-565, :606).  Implement the
            # natural extension — tokens weighted per-utterance by 1/ilens,
            # mirroring the mel formula.
            dur = C.duration_loss(
                f32(d_outs), batch.durations, in_mask,
                offset=cfg.duration_predictor_offset,
                weighted_n_valid=n_valid)
        else:
            l1 = masked_l1(f32(after), mel32, out_mask) + \
                masked_l1(f32(before), mel32, out_mask)
            mse = masked_mse(f32(after), mel32, out_mask) + \
                masked_mse(f32(before), mel32, out_mask)
            # duration loss is ALWAYS masked, independent of use_masking
            # (e2e_tts_tacotron2_sa.py:560-565)
            dur = C.duration_loss(f32(d_outs), batch.durations, in_mask,
                                  offset=cfg.duration_predictor_offset)
        loss = l1 + mse + dur
        report = {"l1_loss": l1, "mse_loss": mse, "dur_loss": dur}

        if cfg.use_fe_condition:
            if cfg.use_weighted_masking:
                # same latent reference gap as durations (prosody_criterions
                # with reduction='none' is never re-reduced, :100-133);
                # natural extension: per-utterance token weighting.
                pitch = weighted_mse(f32(p_outs), f32(batch.f0),
                                     in_mask[..., None], n_valid)
                energy = weighted_mse(f32(e_outs), f32(batch.energy),
                                      in_mask[..., None], n_valid)
            else:
                fe_mask = in_mask[..., None] if cfg.use_masking else None
                pitch = masked_mse(f32(p_outs), f32(batch.f0), fe_mask)
                energy = masked_mse(f32(e_outs), f32(batch.energy), fe_mask)
            loss = loss + pitch + energy  # prosody_weight 1.0 (:612-613)
            report["pitch_loss"] = pitch
            report["energy_loss"] = energy
        report["loss"] = loss

        new_state = {"encoder": enc_state, "decoder": dec_state}
        knowledge = None
        if capture_kd:
            # teacher-knowledge 5-tuple layout
            # (…_kd_teacher.py:597-603): outputs, encoder items, decoder
            # items, prosody items — caller applies stop_gradient.
            knowledge = {
                "after_outs": after,
                "before_outs": before,
                "encoder": enc_kd,
                "decoder": [dec_kd["prenet"], dec_kd["lstm0"],
                            dec_kd["lstm1"], *dec_kd["postnet"]],
                "prosody": [d_outs[..., None], p_outs, e_outs, p_embs,
                            e_embs],
            }
        return loss, (report, new_state, knowledge)

    # ---------------- inference ----------------

    def synth_frontend(self, params, state, tokens, ilens, durations=None,
                       f0=None, energy=None, spembs=None,
                       d_factor: float = 1.0):
        """Encoder + duration/pitch/energy predictors + fe-conditioning —
        the per-phoneme half of synthesis (everything before the AR
        decoder).  Shared by ``synthesize`` (whole-utterance) and
        ``infer.stream.StreamTTS`` (chunked streaming decode).

        Returns (hs, d_outs, p_outs, e_outs): hs (B, Tmax, adim) in
        compute dtype, conditioned; d_outs (B, Tmax) int32 clipped
        per-token frame counts (zero at padding).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if dtype != jnp.float32:
            params = _cast_floats(params, dtype)
        B, Tmax = tokens.shape
        hs, _, _ = encoder_apply(params["encoder"], state["encoder"], cfg,
                                 tokens, ilens, None, train=False)
        if cfg.spk_embed_dim:
            hs = _concat_spemb(hs, spembs)
        pad_mask = lengths_to_pad_mask(ilens, Tmax)

        if durations is None:
            d_outs = C.duration_predictor_inference(
                params["duration_predictor"], hs, pad_mask,
                offset=cfg.duration_predictor_offset)
        else:
            d_outs = durations.astype(jnp.int32)
        # speaking-rate knob applies to BOTH sources; d_factor is a traced
        # scalar so changing the rate does NOT recompile (exact identity at
        # 1.0: round(int * 1.0) == int)
        d_outs = jnp.round(d_outs.astype(jnp.float32)
                           * jnp.asarray(d_factor, jnp.float32)
                           ).astype(jnp.int32)
        d_outs = jnp.clip(d_outs, 0, cfg.max_dur)
        d_outs = jnp.where(pad_mask, 0, d_outs)

        if cfg.use_fe_condition:
            if f0 is None:
                p_outs = C.variance_predictor_apply(
                    params["pitch_predictor"], hs, pad_mask, None,
                    0.0, False)
                e_outs = C.variance_predictor_apply(
                    params["energy_predictor"], hs, pad_mask, None,
                    0.0, False)
            else:
                p_outs, e_outs = f0, energy
            p_embs = C.scalar_embed_apply(params["pitch_embed"], p_outs,
                                          None, 0.0, False)
            e_embs = C.scalar_embed_apply(params["energy_embed"], e_outs,
                                          None, 0.0, False)
            hs = hs + p_embs + e_embs
        else:
            p_outs = e_outs = None
        return hs, d_outs, p_outs, e_outs

    def synthesize(self, params, state, tokens, ilens, rng,
                   frame_budget: int,
                   durations=None, f0=None, energy=None, spembs=None,
                   d_factor: float = 1.0, decoder_backend: str = "auto",
                   ragged_decode: bool = True, quantize: str = "none",
                   prequant=None):
        """Batched device-only synthesis.

        Args:
            tokens: (B, Tmax) int32 (PAD=0).
            ilens: (B,) lengths.
            frame_budget: static per-utterance output frame budget (Lmax).
            durations/f0/energy: optional (B, Tmax)/(B, Tmax, 1) overrides —
                the reference's control knobs (e2e_tts_tacotron2_sa.py:642-658).
            d_factor: multiplies predicted durations (speed control; an
                extension over the reference's all-or-nothing dur override).
            ragged_decode: sort segments by duration (descending, on
                device) and bound every decode backend by ACTUAL durations
                instead of the static max_dur cap: per-tile step bounds
                for the Pallas kernels, a dynamic trip count for the XLA
                scan.  Mean durations are ~8 frames vs the 50-frame cap
                (and pad slots are 0), so most AR steps in the capped
                layout are wasted; sorting concentrates the long tail in
                the first tile and all-pad tiles cost zero steps.  Exact:
                segments are independent and frames past each duration are
                zero either way (only the stochastic prenet-dropout draw
                moves with the slot order).  The reference pads every
                phoneme to the cap (/root/reference/tts.py:243-263).
            quantize: "none" | "int8" — int8 streams the weight-streaming
                Pallas decoder's big recurrent matrices as per-column
                symmetric int8 (half the DMA bytes of bf16; weight-only,
                ~1e-2 relative mel error).  Only affects the pallas_hbm
                path — VMEM-resident and scan decodes ignore it (their
                weights are not re-read per step from HBM).
            prequant: optional (wbig_q, scales) from
                ops.decoder_pallas.prequantize_hbm_weights — serving
                wrappers pass precomputed int8 codes so every jitted
                call skips the ~50 MB inline quantization read.

        Returns dict(mel=(B, frame_budget, odim), olens=(B,), d_outs, ...).

        The whole function is jittable: predicted durations are turned into
        the segment plan with cumsums + gathers on device (cf. reference
        host loops tts.py:665-671, decoder_sa.py:619-630).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if dtype != jnp.float32:
            params = _cast_floats(params, dtype)
        B, Tmax = tokens.shape
        D = cfg.max_dur
        P = B * Tmax  # one segment slot per token
        _, k_dec = random.split(rng)

        hs, d_outs, p_outs, e_outs = self.synth_frontend(
            params, state, tokens, ilens, durations=durations, f0=f0,
            energy=energy, spembs=spembs, d_factor=d_factor)

        # ---- device-side segment plan from durations ----
        # Segments in utterance-major token order; zero-duration tokens keep
        # a padded slot (masked), matching reference's dropped segments.
        flat_dur = d_outs.reshape(B * Tmax)[:P]
        seg_utt = (jnp.arange(P, dtype=jnp.int32) // Tmax)
        seg_tok = (jnp.arange(P, dtype=jnp.int32) % Tmax)
        csum = jnp.cumsum(flat_dur.reshape(B, Tmax), axis=1)
        seg_start = (csum - d_outs).reshape(B * Tmax)[:P]
        olens = jnp.minimum(csum[:, -1], frame_budget)
        tile_bounds = step_bound = None
        if ragged_decode:
            # duration-sorted slot order: every downstream use of a
            # segment (enc gather, frame scatter) is index-driven, so
            # permuting the index vectors relabels slots for free
            order = jnp.argsort(-flat_dur)
            flat_dur = jnp.take(flat_dur, order)
            seg_utt = jnp.take(seg_utt, order)
            seg_tok = jnp.take(seg_tok, order)
            seg_start = jnp.take(seg_start, order)
            from fcl_taco2_tpu.ops.decoder_pallas import tile_step_bounds
            # per-tile max is bound-correct even unsorted; sorting is
            # what makes the bounds SMALL
            tile_bounds = tile_step_bounds(flat_dur)
            step_bound = flat_dur.max()
        d_range = jnp.arange(D, dtype=jnp.int32)[None, :]
        frame_mask = d_range < flat_dur[:, None]
        position = jnp.where(
            frame_mask,
            d_range.astype(jnp.float32)
            / jnp.maximum(flat_dur[:, None], 1).astype(jnp.float32),
            0.0).astype(dtype)

        enc_seg = gather_token_vectors(hs, seg_utt, seg_tok)
        seg_out = self.decode_segments(params, state, enc_seg, flat_dur,
                                       position, frame_mask, k_dec,
                                       decoder_backend=decoder_backend,
                                       tile_bounds=tile_bounds,
                                       step_bound=step_bound,
                                       quantize=quantize,
                                       prequant=prequant)

        # scatter phoneme frames into per-utterance timelines; frames past
        # the budget or past each phoneme's duration go to a drop slot
        frame_pos = seg_start[:, None] + d_range
        keep = frame_mask & (frame_pos < frame_budget)
        tgt = jnp.where(keep, seg_utt[:, None] * frame_budget + frame_pos,
                        B * frame_budget)
        flat = jnp.zeros((B * frame_budget + 1, cfg.odim), seg_out.dtype)
        flat = flat.at[tgt.reshape(-1)].set(
            seg_out.reshape(P * D, cfg.odim), mode="drop")
        before = flat[:B * frame_budget].reshape(B, frame_budget, cfg.odim)

        seq_mask = lengths_to_non_pad_mask(olens, frame_budget)
        after = apply_postnet_inference(params["decoder"], state["decoder"],
                                        cfg, before, seq_mask=seq_mask)
        out_mask = seq_mask[..., None]
        after = after * out_mask.astype(after.dtype)
        return {"mel": after.astype(jnp.float32), "olens": olens,
                "d_outs": d_outs, "p_outs": p_outs, "e_outs": e_outs}

    def decode_segments(self, params, state, enc_seg, flat_dur, position,
                        frame_mask, k_dec, decoder_backend: str = "auto",
                        tile_bounds=None, step_bound=None,
                        quantize: str = "none", prequant=None):
        """AR-decode a batch of phoneme segments -> (P, max_dur, odim).

        The backend dispatch half of ``synthesize`` — shared by
        whole-utterance synthesis and ``infer.stream.StreamTTS`` (which
        decodes phoneme CHUNKS incrementally).  ``params`` must already
        be cast to the compute dtype.

        ``tile_bounds`` ((ceil(P/TILE),) int32) / ``step_bound`` (scalar
        int32) optionally cap the AR trip counts by actual durations
        (see ``synthesize`` ragged_decode): the Pallas kernels take the
        per-tile bounds, the XLA scan the global bound.

        ``decoder_backend``: "auto" | "scan" | "pallas" (VMEM-resident
        kernel) | "pallas_hbm" (weight-streaming kernel) | "hybrid"
        (multi-tile teacher batches: head tile on the weight-streaming
        kernel, rest on one residual-bounded scan; requires
        ragged_decode).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        P, D = frame_mask.shape
        if quantize not in ("none", "int8"):
            raise ValueError(f"quantize must be 'none' or 'int8', "
                             f"got {quantize!r}")
        # the fused kernel hard-codes the reference topology: 2 prenet
        # layers, appended position column, enc-concat feat_out, 2 LSTMs
        pallas_compatible = (cfg.prenet_layers == 2 and cfg.append_position
                             and cfg.use_concate and cfg.dlayers == 2
                             and cfg.reduction_factor == 1)
        from fcl_taco2_tpu.ops.decoder_pallas import fits_vmem
        # residency policy (results/PALLAS_decoder.json): fp32 weights
        # are FASTER than bf16 in-kernel (the per-step activation cast
        # costs more than the halved residency buys), so prefer fp32
        # whenever it fits and fall back to bf16 only to fit VMEM
        if fits_vmem(cfg, D):
            kernel_wdt = jnp.float32
        elif fits_vmem(cfg, D, weights_dtype=jnp.bfloat16):
            kernel_wdt = jnp.bfloat16
        else:
            kernel_wdt = None
        # HBM weight-streaming kernel: teacher-size models (weights >
        # VMEM) on a SINGLE phoneme tile — each grid tile re-streams the
        # big matrices, so multi-tile batches are faster on the XLA scan
        # (measured: 1.19-1.25x vs scan at P=128, 0.76x at P=512,
        # results/PALLAS_decoder.json hbm_stream columns)
        from fcl_taco2_tpu.ops.decoder_pallas import (TILE,
                                                      hbm_stream_compatible)
        hbm_ok = (hbm_stream_compatible(cfg) and kernel_wdt is None
                  and P <= TILE)
        use_hybrid = False
        if decoder_backend == "auto":
            on_tpu = jax.default_backend() == "tpu"
            use_pallas = on_tpu and pallas_compatible and \
                kernel_wdt is not None
            use_hbm = on_tpu and not use_pallas and hbm_ok
            # multi-tile teacher batches with ragged bounds: the hybrid
            # split (head tile on the weight-streaming kernel, rest on
            # one residual-bounded scan) measured 1.165x vs the plain
            # ragged scan at B=16 (1.485M vs 1.274M frames/s,
            # results/BENCH_local.json batch16_synth_hybrid row), so
            # auto selects it whenever its preconditions hold
            use_hybrid = (on_tpu and not use_pallas and not use_hbm
                          and hbm_stream_compatible(cfg)
                          and kernel_wdt is None and P > TILE
                          and tile_bounds is not None)
        elif decoder_backend == "pallas_hbm":
            use_pallas = False
            use_hbm = True
            if not hbm_stream_compatible(cfg):
                raise ValueError(
                    "decoder_backend='pallas_hbm' requires prenet_layers=2, "
                    "append_position, use_concate, dlayers=2, "
                    "reduction_factor=1 and dunits % 256 == 0")
        elif decoder_backend == "hybrid":
            # duration-sorted hybrid for teacher-size MULTI-TILE batches:
            # tile 0 holds the whole long-duration tail (synthesize sorts
            # segments descending), so it rides the weight-streaming
            # kernel at its own bound while the remaining rows run ONE
            # XLA scan at the much smaller residual bound (the 129th-
            # largest duration; mean dur ~8 vs the ~50-frame tail).
            # Also what "auto" picks when the preconditions hold
            # (measured 1.165x vs the ragged scan at B=16,
            # results/BENCH_local.json batch16_synth_hybrid row).
            use_pallas = False
            use_hbm = False
            use_hybrid = True
            if not hbm_stream_compatible(cfg):
                raise ValueError(
                    "decoder_backend='hybrid' requires the pallas_hbm-"
                    "compatible topology (prenet_layers=2, "
                    "append_position, use_concate, dlayers=2, "
                    "reduction_factor=1, dunits % 256 == 0)")
            if tile_bounds is None:
                raise ValueError(
                    "decoder_backend='hybrid' requires ragged_decode "
                    "(duration-sorted segments with per-tile bounds)")
            if P <= TILE:
                use_hybrid = False
                use_hbm = True  # single tile: plain weight-streaming path
        else:
            use_hbm = False
            use_pallas = decoder_backend == "pallas"
            if use_pallas and not pallas_compatible:
                raise ValueError(
                    "decoder_backend='pallas' requires prenet_layers=2, "
                    "append_position, use_concate, dlayers=2 and "
                    "reduction_factor=1")
            if use_pallas and kernel_wdt is None:
                raise ValueError(
                    "decoder_backend='pallas' but the decoder weights fit "
                    "VMEM in neither fp32 nor bf16 (ops/decoder_pallas."
                    "fits_vmem); use decoder_backend='auto', 'pallas_hbm' "
                    "or 'scan'")
        if use_pallas:
            # fused Pallas AR loop: decoder weights stay resident in VMEM
            # across all D steps (ops/decoder_pallas.py; 2-2.7x vs scan
            # for the student model)
            from fcl_taco2_tpu.ops.decoder_pallas import fused_ar_decode
            seed = jax.random.randint(k_dec, (), 0, 2 ** 31 - 1)
            seg_out = fused_ar_decode(
                params["decoder"], enc_seg, position, seed,
                zoneout=cfg.zoneout_rate, dropout=cfg.dropout_rate,
                weights_dtype=kernel_wdt, bounds=tile_bounds)
            seg_out = seg_out.astype(dtype) \
                * frame_mask[..., None].astype(dtype)
        elif use_hbm:
            # weight-streaming Pallas AR loop: big recurrent matrices stay
            # in HBM, double-buffered into VMEM per chunk (bf16 weights —
            # fp32 doubles the DMA bound, measured slower; int8 halves it,
            # see quantize arg)
            from fcl_taco2_tpu.ops.decoder_pallas import fused_ar_decode_hbm
            seed = jax.random.randint(k_dec, (), 0, 2 ** 31 - 1)
            stream_wdt = jnp.int8 if quantize == "int8" else jnp.bfloat16
            seg_out = fused_ar_decode_hbm(
                params["decoder"], enc_seg, position, seed,
                zoneout=cfg.zoneout_rate, dropout=cfg.dropout_rate,
                weights_dtype=stream_wdt, bounds=tile_bounds,
                prequant=prequant)
            seg_out = seg_out.astype(dtype) \
                * frame_mask[..., None].astype(dtype)
        elif use_hybrid:
            # head tile through the weight-streaming kernel (it holds the
            # long tail after the descending sort), remaining rows through
            # one ragged scan at the residual bound — the scan re-reads
            # every weight per step, so cutting its trip count from the
            # global max (~cap) to the 129th-largest duration is the win;
            # the kernel re-streams weights per tile, so ONLY tile 0 rides
            # it (multi-tile kernel loses to the scan, measured 0.76x at
            # P=512, results/PALLAS_decoder.json)
            from fcl_taco2_tpu.ops.decoder_pallas import fused_ar_decode_hbm
            seed = jax.random.randint(k_dec, (), 0, 2 ** 31 - 1)
            stream_wdt = jnp.int8 if quantize == "int8" else jnp.bfloat16
            head = fused_ar_decode_hbm(
                params["decoder"], enc_seg[:TILE], position[:TILE], seed,
                zoneout=cfg.zoneout_rate, dropout=cfg.dropout_rate,
                weights_dtype=stream_wdt, bounds=tile_bounds[:1],
                prequant=prequant)
            head = head.astype(dtype) \
                * frame_mask[:TILE, :, None].astype(dtype)
            rest = decoder_inference(
                params["decoder"], state["decoder"], cfg, enc_seg[TILE:],
                flat_dur[TILE:], position[TILE:], frame_mask[TILE:],
                k_dec, step_bound=jnp.max(tile_bounds[1:]))
            seg_out = jnp.concatenate([head, rest.astype(dtype)], axis=0)
        else:
            seg_out = decoder_inference(params["decoder"], state["decoder"],
                                        cfg, enc_seg, flat_dur, position,
                                        frame_mask, k_dec,
                                        step_bound=step_bound)
        return seg_out
