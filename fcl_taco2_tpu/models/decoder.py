"""Semi-autoregressive shared decoder over the flattened phoneme batch.

Reference: /root/reference/nets/modules/decoder_sa.py:289-639 (plain) and
decoder_sa_kd.py:523-800 (KD captures).  Topology per step:

    x_t = concat(enc_vec, prenet(prev_frame), position_t)     (:495-499)
    z0, c0 = ZoneOutLSTM0(x_t);  z1, c1 = ZoneOutLSTM1(z0)    (:500-504)
    out_t = feat_out(concat(z1, enc_vec))                      (:505-511)

TPU-first redesign of the hot loop (SURVEY.md hot loop #1):

- Teacher forcing means prev_frame is data, so the prenet runs ONCE over all
  (P, D) frames as one big GEMM before the scan; the scan body carries only
  LSTM state and runs 5 MXU matmuls over the full phoneme batch P.
- AR inference is a true recurrence: prenet stays in the scan, outputs feed
  back; still one lax.scan of static length D (frames beyond each phoneme's
  duration are masked out afterwards).
- Frame regrouping back to utterance-major is an index gather
  (ops/regroup.scatter_frames), not host slicing.
"""

import jax
import jax.numpy as jnp
from jax import lax, random

from fcl_taco2_tpu.models import components as C
from fcl_taco2_tpu.ops.regroup import scatter_frames
from fcl_taco2_tpu.ops.rnn import lstm_cell, zoneout
from fcl_taco2_tpu.utils import initializers as init


def decoder_init(key, cfg):
    ks = random.split(key, 5)
    idim = cfg.dec_idim
    lstm0_in = idim + cfg.prenet_units + (1 if cfg.append_position else 0)
    feat_in = (idim + cfg.dunits) if cfg.use_concate else cfg.dunits
    postnet_params, postnet_state = C.conv_bn_stack_init(
        ks[3], cfg.postnet_layers, cfg.odim, cfg.postnet_chans, cfg.odim,
        cfg.postnet_filts, init.TANH_GAIN, last_is_out=True)
    params = {
        "prenet": C.prenet_init(ks[0], cfg.odim, cfg.prenet_layers,
                                cfg.prenet_units),
        "lstm0": C.lstm_params_init(ks[1], lstm0_in, cfg.dunits),
        "lstm1": C.lstm_params_init(ks[2], cfg.dunits, cfg.dunits),
        "postnet": postnet_params,
        # feat_out is bias-free (decoder_sa.py:398)
        "feat_out": {"w": init.linear_weight(ks[4], (feat_in,
                                                     cfg.odim
                                                     * cfg.reduction_factor))},
    }
    return params, {"postnet": postnet_state}


def _lstm_stack_step(params, cfg, x_t, carry, zo_key, train):
    """One step of the 2-layer zoneout-LSTM stack + feat_out."""
    h0, c0, h1, c1 = carry
    if train and cfg.zoneout_rate > 0.0:
        kh0, kc0, kh1, kc1 = random.split(zo_key, 4)
    else:
        kh0 = kc0 = kh1 = kc1 = None
    nh0, nc0 = lstm_cell(C.as_lstm(params["lstm0"]), x_t, h0, c0)
    nh0 = zoneout(h0, nh0, cfg.zoneout_rate, train=train, rng=kh0)
    nc0 = zoneout(c0, nc0, cfg.zoneout_rate, train=train, rng=kc0)
    nh1, nc1 = lstm_cell(C.as_lstm(params["lstm1"]), nh0, h1, c1)
    nh1 = zoneout(h1, nh1, cfg.zoneout_rate, train=train, rng=kh1)
    nc1 = zoneout(c1, nc1, cfg.zoneout_rate, train=train, rng=kc1)
    return (nh0, nc0, nh1, nc1)


def _feat_out(params, cfg, z1, enc_seg):
    zcs = jnp.concatenate([z1, enc_seg], axis=-1) if cfg.use_concate else z1
    return zcs @ params["feat_out"]["w"]  # (P, odim*r)


def _zero_carry(P, H, dtype):
    z = jnp.zeros((P, H), dtype)
    return (z, z, z, z)


def decoder_teacher_forced(params, state, cfg, enc_seg, seg_targets, position,
                           frame_mask, utt_gather, utt_mask, rng, train,
                           capture_kd=False):
    """Teacher-forced pass over the phoneme batch.

    Args:
        enc_seg: (P, idim) per-segment encoder vectors (prosody already
            added, decoder_sa.py:461-462 then :467).
        seg_targets: (P, D, odim) per-segment target frames (zero padded).
        position: (P, D) normalized position ramps.
        frame_mask: (P, D) validity.
        utt_gather/utt_mask: regroup plan for utterance-major output.
    Returns:
        (after_outs, before_outs, new_state, kd) with outs (B, Lmax, odim);
        kd = dict(prenet, lstm0, lstm1, postnet=[5 tensors]) utterance-major
        (decoder_sa_kd.py:627-702) or None.
    """
    P, D, odim = seg_targets.shape
    dtype = enc_seg.dtype
    k_pre, k_zo, k_post = random.split(rng, 3)

    # teacher forcing input at step t is target frame t-1 (zeros at t=0)
    prev = jnp.concatenate(
        [jnp.zeros((P, 1, odim), dtype), seg_targets[:, :-1]], axis=1)
    # hoisted prenet over all steps: one (P*D, odim) GEMM chain
    prenet_all = C.prenet_apply(params["prenet"], prev.reshape(P * D, odim),
                                k_pre, cfg.dropout_rate)
    prenet_all = prenet_all.reshape(P, D, -1)

    zo_keys = random.split(k_zo, D) if (train and cfg.zoneout_rate > 0) else \
        jnp.zeros((D, 2), jnp.uint32)

    def step(carry, inp):
        prenet_t, pos_t, zo_key = inp
        parts = [enc_seg, prenet_t]
        if cfg.append_position:
            parts.append(pos_t[:, None])
        x_t = jnp.concatenate(parts, axis=-1)
        new_carry = _lstm_stack_step(params, cfg, x_t, carry, zo_key, train)
        out_t = _feat_out(params, cfg, new_carry[2], enc_seg)
        ys = (out_t, new_carry[0], new_carry[2]) if capture_kd else out_t
        return new_carry, ys

    if cfg.remat_decoder:
        # prevent_cse=False: inside lax.scan the loop structure already
        # prevents the CSE that prevent_cse guards against (per JAX docs),
        # and the default's optimization barriers inhibit TPU fusion
        step = jax.checkpoint(step, prevent_cse=False)

    xs = (jnp.swapaxes(prenet_all, 0, 1), position.T, zo_keys)
    _, outs = lax.scan(step, _zero_carry(P, cfg.dunits, dtype), xs)
    if capture_kd:
        outs, z0s, z1s = outs
    seg_out = jnp.swapaxes(outs, 0, 1)  # (P, D, odim)

    before = scatter_frames(seg_out, utt_gather, utt_mask)  # (B, Lmax, odim)
    post_capture = [] if capture_kd else None
    correction, post_state = C.postnet_apply(
        params["postnet"], state["postnet"], before, k_post,
        cfg.dropout_rate, train, capture=post_capture,
        seq_mask=utt_mask if train else None)
    after = before + correction

    kd = None
    if capture_kd:
        # KD items are regrouped utterance-major like the outputs
        # (decoder_sa_kd.py:634-655); postnet captures already are.
        kd = {
            "prenet": scatter_frames(prenet_all, utt_gather, utt_mask),
            "lstm0": scatter_frames(jnp.swapaxes(z0s, 0, 1), utt_gather,
                                    utt_mask),
            "lstm1": scatter_frames(jnp.swapaxes(z1s, 0, 1), utt_gather,
                                    utt_mask),
            "postnet": post_capture,
        }
    return after, before, {"postnet": post_state}, kd


def decoder_inference(params, state, cfg, enc_seg, seg_dur, position,
                      frame_mask, rng):
    """Autoregressive synthesis over the phoneme batch (eval mode).

    Reference decoder_sa.py:544-639: AR loop feeding back own outputs;
    prenet dropout stays ACTIVE (stochastic inference, decoder_sa.py:109-112).

    Returns seg_out (P, D, odim) BEFORE postnet regrouping; the caller
    regroups (device-side cumsum scatter) and applies the postnet, because
    postnet BN runs on the utterance-major sequence.
    """
    P, D = frame_mask.shape
    dtype = enc_seg.dtype
    odim = cfg.odim
    pre_keys = random.split(rng, D)

    def step(carry, inp):
        pos_t, k_pre = inp
        lstm_carry, prev_out = carry
        prenet_t = C.prenet_apply(params["prenet"], prev_out, k_pre,
                                  cfg.dropout_rate)
        parts = [enc_seg, prenet_t]
        if cfg.append_position:
            parts.append(pos_t[:, None])
        x_t = jnp.concatenate(parts, axis=-1)
        new_carry = _lstm_stack_step(params, cfg, x_t, lstm_carry, None,
                                     train=False)
        out_t = _feat_out(params, cfg, new_carry[2], enc_seg)
        return (new_carry, out_t), out_t

    carry0 = (_zero_carry(P, cfg.dunits, dtype), jnp.zeros((P, odim), dtype))
    _, outs = lax.scan(step, carry0, (position.T, pre_keys))
    seg_out = jnp.swapaxes(outs, 0, 1)  # (P, D, odim)
    return seg_out * frame_mask[..., None].astype(dtype)


def apply_postnet_inference(params, state, cfg, before, seq_mask=None):
    """Postnet in eval mode on (B, L, odim); returns after_outs.

    ``seq_mask`` keeps padded-batch numerics identical to the reference's
    exact-length batch-1 postnet (decoder_sa.py:631-633)."""
    correction, _ = C.postnet_apply(
        params["postnet"], state["postnet"], before, None,
        cfg.dropout_rate, train=False, seq_mask=seq_mask)
    return before + correction
