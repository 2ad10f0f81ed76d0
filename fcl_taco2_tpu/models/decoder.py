"""Semi-autoregressive shared decoder over the flattened phoneme batch.

Reference: /root/reference/nets/modules/decoder_sa.py:289-639 (plain) and
decoder_sa_kd.py:523-800 (KD captures).  Topology per step:

    x_t = concat(enc_vec, prenet(prev_frame), position_t)     (:495-499)
    z_0 = ZoneOutLSTM_0(x_t); z_i = ZoneOutLSTM_i(z_{i-1})    (:500-504)
    out_t = feat_out(concat(z_last, enc_vec))                  (:505-511)

Config generality (decoder_sa.py ctor :303-398): ``dlayers`` stacked
zoneout-LSTM cells, ``prenet_layers=0`` feeds the raw previous frame,
``postnet_layers=0`` skips the postnet, ``use_batch_norm=False`` drops BN
from the postnet, and ``reduction_factor=r>1`` emits r frames per decoder
step from an odim*r feat_out (:398) with the teacher-forcing input thinned
to every r-th frame (:488-489).

TPU-first redesign of the hot loop (SURVEY.md hot loop #1):

- Teacher forcing means prev_frame is data, so the prenet runs ONCE over all
  (P, S) step inputs as one big GEMM before the scan; the scan body carries
  only LSTM state and runs the recurrent MXU matmuls over the full phoneme
  batch P.
- AR inference is a true recurrence: prenet stays in the scan, outputs feed
  back; still one lax.scan of static length S (frames beyond each phoneme's
  duration are masked out afterwards).
- Frame regrouping back to utterance-major is an index gather
  (ops/regroup.scatter_frames), not host slicing.

reduction_factor semantics note: the reference indexes the frame-resolution
position ramp by the *step* index (decoder_sa.py:497-498, 596-597), i.e.
``position[:, :steps]`` — identical to ours at r=1 and reproduced verbatim
for r>1.  At inference the reference multiplies durations by r
(decoder_sa.py:573, 627), making a model emit r× the frames it was trained
on; here durations stay in frames on both paths so train and inference
agree (documented deviation).
"""

import jax
import jax.numpy as jnp
from jax import lax, random

from fcl_taco2_tpu.models import components as C
from fcl_taco2_tpu.ops.regroup import scatter_frames, scatter_frames_classed
from fcl_taco2_tpu.ops.rnn import lstm_cell, zoneout, zoneout_keep_masks
from fcl_taco2_tpu.ops.rnn_vjp import ScanSpec, zoneout_lstm_scan
from fcl_taco2_tpu.utils import initializers as init


def decoder_init(key, cfg):
    k_pre, k_lstm, k_post, k_feat = random.split(key, 4)
    idim = cfg.dec_idim
    lstm0_in = (idim + cfg.effective_prenet_units
                + (1 if cfg.append_position else 0))
    feat_in = (idim + cfg.dunits) if cfg.use_concate else cfg.dunits
    params = {
        # feat_out is bias-free (decoder_sa.py:398)
        "feat_out": {"w": init.linear_weight(
            k_feat, (feat_in, cfg.odim * cfg.reduction_factor))},
    }
    state = {}
    if cfg.prenet_layers > 0:
        params["prenet"] = C.prenet_init(k_pre, cfg.odim, cfg.prenet_layers,
                                         cfg.prenet_units)
    for i in range(cfg.dlayers):
        k_lstm, sub = random.split(k_lstm)
        in_dim = lstm0_in if i == 0 else cfg.dunits
        params[f"lstm{i}"] = C.lstm_params_init(sub, in_dim, cfg.dunits)
    if cfg.postnet_layers > 0:
        postnet_params, postnet_state = C.conv_bn_stack_init(
            k_post, cfg.postnet_layers, cfg.odim, cfg.postnet_chans,
            cfg.odim, cfg.postnet_filts, init.TANH_GAIN, last_is_out=True,
            use_bn=cfg.use_batch_norm)
        params["postnet"] = postnet_params
        state["postnet"] = postnet_state
    return params, state


def _zoneout_keep_masks(zo_key, cfg, P):
    """All 2*dlayers keep-old bernoulli masks for one step, ONE bits call.

    The reference draws each mask with an independent torch RNG op
    (decoder_sa.py:91-93); a jax translation (split + bernoulli per mask)
    spends ~20% of the teacher decoder's train-scan time in threefry lane
    math (results/PALLAS_decoder.json train_scan_experiments).  Batching
    the draw and, with cfg.zoneout_rng='rbg', lowering to XLA
    RngBitGenerator (the TPU hardware PRNG) makes the masks nearly free;
    'threefry' keeps jax's default counter-based stream.  ``zo_key`` is a
    raw uint32[2] key-data pair (one per scan step)."""
    return zoneout_keep_masks(zo_key, 2 * cfg.dlayers, P, cfg.dunits,
                              cfg.zoneout_rate, cfg.zoneout_rng)


def _lstm_stack_step(params, cfg, x_t, carry, zo_key, train, xproj0=None):
    """One step of the dlayers-deep zoneout-LSTM stack.

    ``carry`` is a flat tuple (h0, c0, h1, c1, ...); layer i>0 consumes
    h_{i-1} (decoder_sa.py:500-504).  ``xproj0`` — the hoisted layer-0
    input projection ``x_t @ wx0 + bx0`` (see callers) — replaces ``x_t``;
    only layer 0's input GEMM can be hoisted (layers >0 consume the
    carry-dependent h_{i-1})."""
    use_zo = train and cfg.zoneout_rate > 0.0
    keep = _zoneout_keep_masks(zo_key, cfg, carry[0].shape[0]) if use_zo \
        else None
    new_carry = []
    inp = x_t
    for i in range(cfg.dlayers):
        h, c = carry[2 * i], carry[2 * i + 1]
        if i == 0 and xproj0 is not None:
            nh, nc = lstm_cell(C.as_lstm(params["lstm0"]), None, h, c,
                               precomputed_xproj=xproj0)
        else:
            nh, nc = lstm_cell(C.as_lstm(params[f"lstm{i}"]), inp, h, c)
        kh = keep[2 * i] if use_zo else None
        kc = keep[2 * i + 1] if use_zo else None
        nh = zoneout(h, nh, cfg.zoneout_rate, train=train, keep=kh)
        nc = zoneout(c, nc, cfg.zoneout_rate, train=train, keep=kc)
        new_carry += [nh, nc]
        inp = nh
    return tuple(new_carry)


def _split_lstm0_wx(params, cfg, idim):
    """Row blocks of lstm0's packed input weight for the concat order
    [enc_seg, prenet_out, position] (see decoder_init lstm0_in): splitting
    the concat-GEMM into partial matmuls lets the step-invariant enc part
    be computed ONCE outside the scan (mirror of the fused Pallas kernel's
    enc_gates hoist, ops/decoder_pallas.py:59)."""
    wx0 = params["lstm0"]["wx"]
    u = cfg.effective_prenet_units
    w_enc = wx0[:idim]
    w_pre = wx0[idim:idim + u]
    w_pos = wx0[idim + u] if cfg.append_position else None  # (4H,) row
    return w_enc, w_pre, w_pos


def _split_feat_out(params, cfg):
    """feat_out row blocks for concat order [z_last, enc_seg]
    (decoder_init feat_in; torch layout parity with decoder_sa.py:398)."""
    wf = params["feat_out"]["w"]
    if not cfg.use_concate:
        return wf, None
    return wf[:cfg.dunits], wf[cfg.dunits:]


def _zero_carry(P, cfg, dtype):
    z = jnp.zeros((P, cfg.dunits), dtype)
    return tuple(z for _ in range(2 * cfg.dlayers))


def _prenet_or_identity(params, cfg, x, rng):
    if cfg.prenet_layers == 0:  # decoder_sa.py:497: prenet_out = prev_out
        return x
    return C.prenet_apply(params["prenet"], x, rng, cfg.dropout_rate)


def _unfold_r(outs_steps, P, S, odim, r):
    """(S, P, odim*r) step outputs -> (P, S*r, odim) frames.

    torch layout parity: feat_out(z).view(P, odim, r) then concat over the
    step axis and transpose (decoder_sa.py:511-517), so flat element
    [o*r + j] is mel bin o of sub-frame j."""
    seg = jnp.swapaxes(outs_steps, 0, 1)  # (P, S, odim*r)
    if r == 1:
        return seg
    seg = seg.reshape(P, S, odim, r)
    return jnp.swapaxes(seg, 2, 3).reshape(P, S * r, odim)


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
    if capture_kd:
        _check_kd_topology(cfg)
    k_core, k_post = random.split(rng)
    seg_out, prenet_all, z0s, z1s = _teacher_forced_core(
        params, cfg, enc_seg, seg_targets, position, k_core, train,
        capture_kd)

    before = scatter_frames(seg_out, utt_gather, utt_mask)  # (B, Lmax, odim)
    after, new_state, post_capture = _apply_train_postnet(
        params, state, cfg, before, k_post, train, utt_mask, capture_kd)

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
    return after, before, new_state, kd


def decoder_teacher_forced_classed(params, state, cfg, class_inputs,
                                   utt_gather, utt_mask, rng, train,
                                   capture_kd=False):
    """Duration-classed teacher-forced pass (SURVEY hard part #1 dual
    bucketing): one scan PER duration class — class c's segments scan only
    D_c steps instead of max_dur — then a single gather back to
    utterance-major through the concatenated-flats ``utt_gather``
    (ops/regroup.ClassedPlan).  Per-segment math is identical to the
    single-class path (each segment's recurrence is independent and frames
    past its duration are never read), so losses match exactly.

    Args:
        class_inputs: tuple of (enc_seg, seg_targets, position) per class,
            shapes (P_c, idim) / (P_c, D_c, odim) / (P_c, D_c).
    Returns:
        same contract as decoder_teacher_forced.
    """
    if capture_kd:
        _check_kd_topology(cfg)
    k_core, k_post = random.split(rng)
    outs = [
        _teacher_forced_core(params, cfg, enc_c, tgt_c, pos_c,
                             random.fold_in(k_core, c), train, capture_kd)
        for c, (enc_c, tgt_c, pos_c) in enumerate(class_inputs)
    ]
    before = scatter_frames_classed([o[0] for o in outs], utt_gather,
                                    utt_mask)
    after, new_state, post_capture = _apply_train_postnet(
        params, state, cfg, before, k_post, train, utt_mask, capture_kd)

    kd = None
    if capture_kd:
        kd = {
            "prenet": scatter_frames_classed([o[1] for o in outs],
                                             utt_gather, utt_mask),
            "lstm0": scatter_frames_classed(
                [jnp.swapaxes(o[2], 0, 1) for o in outs], utt_gather,
                utt_mask),
            "lstm1": scatter_frames_classed(
                [jnp.swapaxes(o[3], 0, 1) for o in outs], utt_gather,
                utt_mask),
            "postnet": post_capture,
        }
    return after, before, new_state, kd


def _check_kd_topology(cfg):
    if (cfg.dlayers != 2 or cfg.reduction_factor != 1
            or cfg.prenet_layers == 0 or cfg.postnet_layers == 0):
        raise ValueError(
            "capture_kd requires the reference KD topology: dlayers=2, "
            "reduction_factor=1, prenet and postnet present "
            "(decoder_sa_kd.py:627-702)")


def _apply_train_postnet(params, state, cfg, before, k_post, train,
                         utt_mask, capture_kd):
    """Postnet on the utterance-major canvas (training path)."""
    if cfg.postnet_layers > 0:
        post_capture = [] if capture_kd else None
        correction, post_state = C.postnet_apply(
            params["postnet"], state["postnet"], before, k_post,
            cfg.dropout_rate, train, capture=post_capture,
            seq_mask=utt_mask if train else None)
        return before + correction, {"postnet": post_state}, post_capture
    # decoder_sa.py:393, 530-533: postnet is optional
    return before, {}, []


def _teacher_forced_core(params, cfg, enc_seg, seg_targets, position, rng,
                         train, capture_kd=False):
    """The teacher-forced scan over one phoneme batch, BEFORE regrouping:
    returns (seg_out (P, D, odim), prenet_all (P, S, units), z0s, z1s)
    with z0s/z1s step-major (S, P, H) when capture_kd else None.  Shared
    by the single-class and duration-classed paths."""
    P, D, odim = seg_targets.shape
    r = cfg.reduction_factor
    S = D // r  # decoder steps (== D when r == 1)
    dtype = enc_seg.dtype
    k_pre, k_zo = random.split(rng)

    # teacher-forcing input at step t is target frame t*r-1 (zeros at t=0);
    # r>1 thins the targets to every r-th frame (decoder_sa.py:488-489)
    thinned = seg_targets if r == 1 else seg_targets[:, r - 1::r]
    prev = jnp.concatenate(
        [jnp.zeros((P, 1, odim), dtype), thinned[:, :-1]], axis=1)
    # hoisted prenet over all steps: one (P*S, odim) GEMM chain
    prenet_all = _prenet_or_identity(params, cfg,
                                     prev.reshape(P * S, odim), k_pre)
    prenet_all = prenet_all.reshape(P, S, -1)

    zo_keys = random.split(k_zo, S) if (train and cfg.zoneout_rate > 0) else \
        jnp.zeros((S, 2), jnp.uint32)

    # step positions: the reference indexes the frame ramp by step index
    # (decoder_sa.py:497-498); identical to per-frame positions at r=1
    pos_steps = position[:, :S]

    # HOIST the step-invariant GEMMs out of the scan (the mirror of the
    # fused Pallas kernel's enc_gates/enc_out hoist,
    # ops/decoder_pallas.py:59-60): the enc half of layer 0's input
    # projection and the enc half of feat_out are carry-independent and
    # computed ONCE; the scan body keeps the small per-step prenet-gate
    # GEMM (units wide) plus the recurrent h @ Wh matmuls.  The reference
    # instead re-runs torch LSTMCell's full input GEMM per step
    # (decoder_sa.py:493-513).
    #
    # Measured negative (v5e, teacher B=16, chained-train-step protocol,
    # bench.py train_step_run): hoisting the prenet gates too —
    # materializing ALL (P, S, 4H) layer-0 gates as one (P*S, units) GEMM
    # before the scan — is 13% SLOWER than this variant end-to-end (97.9
    # vs 86.7 ms/step; pre-hoist baseline 91.8): the ~600 MB gate buffer's
    # HBM write + per-step read exceeds the cost of the small in-loop
    # (P, units) @ (units, 4H) GEMM.  Keep the prenet gates per-step.
    w_enc, w_pre, w_pos = _split_lstm0_wx(params, cfg, enc_seg.shape[-1])
    enc_gates = enc_seg @ w_enc + params["lstm0"]["bx"]       # (P, 4H)
    wf_z, wf_enc = _split_feat_out(params, cfg)
    enc_out = (enc_seg @ wf_enc) if wf_enc is not None else None

    # Custom-VJP path (VERDICT r4 #1, roofline "strategy B"): hand-built
    # backward in ops/rnn_vjp.py — reverse scan carries only (dh, dc),
    # weight grads are post-scan batched GEMMs instead of XLA's per-step
    # HBM dW accumulation.  remat_decoder explicitly requests the
    # autodiff scan, so it wins; decoder_scan_unroll applies to the VJP's
    # own scans (post-strategy-B, unroll no longer multiplies dW traffic).
    if cfg.decoder_custom_vjp and not cfg.remat_decoder:
        spec = ScanSpec(
            dlayers=cfg.dlayers, dunits=cfg.dunits,
            zoneout_rate=float(cfg.zoneout_rate),
            zoneout_impl=cfg.zoneout_rng, train=bool(train),
            capture_kd=bool(capture_kd),
            append_position=bool(cfg.append_position),
            use_enc_out=enc_out is not None,
            unroll=max(1, int(cfg.decoder_scan_unroll)))
        layers = [(params["lstm0"]["wh"], params["lstm0"]["bh"])]
        for i in range(1, cfg.dlayers):
            p = params[f"lstm{i}"]
            layers.append((p["wx"], p["wh"], p["bx"], p["bh"]))
        weights = (w_pre, w_pos if cfg.append_position else None, wf_z,
                   tuple(layers))
        res = zoneout_lstm_scan(
            spec, weights, enc_gates, enc_out,
            jnp.swapaxes(prenet_all, 0, 1),
            pos_steps.T if cfg.append_position else None, zo_keys)
        outs, z0s, z1s = res if capture_kd else (res, None, None)
        seg_out = _unfold_r(outs, P, S, odim, r)  # (P, D, odim)
        return seg_out, prenet_all, z0s, z1s

    def step(carry, inp):
        prenet_t, pos_t, zo_key = inp
        xproj = enc_gates + prenet_t @ w_pre
        if cfg.append_position:
            xproj = xproj + pos_t[:, None] * w_pos
        new_carry = _lstm_stack_step(params, cfg, None, carry, zo_key,
                                     train, xproj0=xproj)
        out_t = new_carry[-2] @ wf_z
        if enc_out is not None:
            out_t = out_t + enc_out
        ys = (out_t, new_carry[0], new_carry[2]) if capture_kd else out_t
        return new_carry, ys

    if cfg.remat_decoder:
        # prevent_cse=False: inside lax.scan the loop structure already
        # prevents the CSE that prevent_cse guards against (per JAX docs),
        # and the default's optimization barriers inhibit TPU fusion
        step = jax.checkpoint(step, prevent_cse=False)

    xs = (jnp.swapaxes(prenet_all, 0, 1), pos_steps.T, zo_keys)
    _, outs = lax.scan(step, _zero_carry(P, cfg, dtype), xs,
                       unroll=max(1, int(cfg.decoder_scan_unroll)))
    z0s = z1s = None
    if capture_kd:
        outs, z0s, z1s = outs
    seg_out = _unfold_r(outs, P, S, odim, r)  # (P, D, odim)
    return seg_out, prenet_all, z0s, z1s


def decoder_inference(params, state, cfg, enc_seg, seg_dur, position,
                      frame_mask, rng, step_bound=None):
    """Autoregressive synthesis over the phoneme batch (eval mode).

    Reference decoder_sa.py:544-639: AR loop feeding back own outputs;
    prenet dropout stays ACTIVE (stochastic inference, decoder_sa.py:109-112).
    With r>1 each step emits r frames and the LAST sub-frame feeds back
    (decoder_sa.py:612-617).

    ``step_bound``: optional TRACED scalar — the batch's max duration in
    frames.  The AR loop then runs ceil(step_bound / r) steps instead of
    the static max_dur cap (a data-dependent trip count; the reference
    always pads every phoneme to the cap, tts.py:243-263).  Frames past
    the bound come back exactly zero.

    Returns seg_out (P, D, odim) BEFORE postnet regrouping; the caller
    regroups (device-side cumsum scatter) and applies the postnet, because
    postnet BN runs on the utterance-major sequence.
    """
    P, D = frame_mask.shape
    r = cfg.reduction_factor
    S = D // r
    dtype = enc_seg.dtype
    odim = cfg.odim
    pre_keys = random.split(rng, S)

    # hoisted step-invariant GEMMs (prenet must stay in-loop — its input
    # is the AR feedback): enc's layer-0 gate contribution and enc's
    # feat_out half are computed ONCE instead of per step (mirror of
    # ops/decoder_pallas.py:59-60; the reference re-multiplies both every
    # step, decoder_sa.py:591-617)
    w_enc, w_pre, w_pos = _split_lstm0_wx(params, cfg, enc_seg.shape[-1])
    enc_gates = enc_seg @ w_enc + params["lstm0"]["bx"]       # (P, 4H)
    wf_z, wf_enc = _split_feat_out(params, cfg)
    enc_out = (enc_seg @ wf_enc) if wf_enc is not None else None

    def step(carry, inp):
        pos_t, k_pre = inp
        lstm_carry, prev_out = carry
        prenet_t = _prenet_or_identity(params, cfg, prev_out, k_pre)
        xproj = enc_gates + prenet_t @ w_pre
        if cfg.append_position:
            xproj = xproj + pos_t[:, None] * w_pos
        new_carry = _lstm_stack_step(params, cfg, None, lstm_carry, None,
                                     train=False, xproj0=xproj)
        out_t = new_carry[-2] @ wf_z
        if enc_out is not None:
            out_t = out_t + enc_out
        # AR feedback: last sub-frame of the group (decoder_sa.py:617)
        prev = out_t if r == 1 else out_t.reshape(P, odim, r)[..., -1]
        return (new_carry, prev), out_t

    carry0 = (_zero_carry(P, cfg, dtype), jnp.zeros((P, odim), dtype))
    pos_steps = position[:, :S]
    if step_bound is None:
        _, outs = lax.scan(step, carry0, (pos_steps.T, pre_keys))
    else:
        # dynamic trip count: identical per-step math, but the loop stops
        # at the batch's true max duration; untouched steps stay zero
        s_bound = jnp.minimum(
            (jnp.asarray(step_bound, jnp.int32) + r - 1) // r, S)
        pos_t_all = pos_steps.T  # (S, P)
        width = params["feat_out"]["w"].shape[1]
        buf0 = jnp.zeros((S, P, width), dtype)

        def body(s, carry_buf):
            carry, buf = carry_buf
            carry, out_t = step(carry, (pos_t_all[s], pre_keys[s]))
            return carry, lax.dynamic_update_index_in_dim(buf, out_t, s, 0)

        _, outs = lax.fori_loop(0, s_bound, body, (carry0, buf0))
    seg_out = _unfold_r(outs, P, S, odim, r)  # (P, D, odim)
    return seg_out * frame_mask[..., None].astype(dtype)


def apply_postnet_inference(params, state, cfg, before, seq_mask=None):
    """Postnet in eval mode on (B, L, odim); returns after_outs.

    ``seq_mask`` keeps padded-batch numerics identical to the reference's
    exact-length batch-1 postnet (decoder_sa.py:631-633)."""
    if cfg.postnet_layers == 0:
        return before
    correction, _ = C.postnet_apply(
        params["postnet"], state["postnet"], before, None,
        cfg.dropout_rate, train=False, seq_mask=seq_mask)
    return before + correction
