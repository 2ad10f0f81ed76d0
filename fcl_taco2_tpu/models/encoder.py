"""Tacotron2-SA encoder: embedding -> 3x(conv-BN-ReLU-dropout) -> BiLSTM.

Reference: /root/reference/nets/modules/encoder_sa.py:21-161 (plain) and
encoder_sa_kd.py:144-197 (KD capture variant — here a ``capture_kd`` flag on
the same forward, no duplicated module).

TPU-first: channels-last layout, BiLSTM as two lax.scans with hoisted input
GEMMs (ops/rnn.py), packed-sequence parity via masked state updates.
"""

from jax import random

from fcl_taco2_tpu.models import components as C
from fcl_taco2_tpu.ops.masking import lengths_to_non_pad_mask
from fcl_taco2_tpu.ops.rnn import bilstm
from fcl_taco2_tpu.utils import initializers as init


def encoder_init(key, cfg):
    k_embed, k_convs, k_f, k_b = random.split(key, 4)
    conv_params, conv_state = C.conv_bn_stack_init(
        k_convs, cfg.econv_layers, cfg.embed_dim, cfg.econv_chans,
        cfg.econv_chans, cfg.econv_filts, init.RELU_GAIN)
    params = {
        "embed": init.embedding_padded(0)(k_embed, (cfg.idim, cfg.embed_dim)),
        "convs": conv_params,
        "blstm_fwd": C.lstm_params_init(k_f, cfg.econv_chans, cfg.eunits // 2),
        "blstm_bwd": C.lstm_params_init(k_b, cfg.econv_chans, cfg.eunits // 2),
    }
    return params, {"convs": conv_state}


def encoder_apply(params, state, cfg, tokens, ilens, rng, train,
                  capture_kd=False):
    """tokens (B, Tmax) int32 -> hs (B, Tmax, eunits).

    Returns (hs, new_state, kd_items) where kd_items is
    [embed, conv0, conv1, conv2, blstm] (encoder_sa_kd.py:196) or None.
    """
    x = params["embed"][tokens]  # (B, T, E); PAD row is zeros
    # valid-position mask for BN statistics (padding would dilute them
    # under fixed-shape batching)
    seq_mask = lengths_to_non_pad_mask(
        ilens, tokens.shape[1]) if train else None
    capture = [] if capture_kd else None
    if capture_kd:
        capture.append(x)
    x, conv_state = C.encoder_convs_apply(
        params["convs"], state["convs"], x, rng, cfg.dropout_rate, train,
        use_residual=cfg.use_residual, capture=capture, seq_mask=seq_mask)
    hs = bilstm(C.as_lstm(params["blstm_fwd"]), C.as_lstm(params["blstm_bwd"]),
                x, ilens)
    if capture_kd:
        capture.append(hs)
    return hs, {"convs": conv_state}, capture
