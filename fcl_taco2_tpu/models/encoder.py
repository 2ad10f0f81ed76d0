"""Tacotron2-SA encoder: embedding -> N x(conv[-BN]-ReLU-dropout) -> BiLSTM.

Reference: /root/reference/nets/modules/encoder_sa.py:21-161 (plain) and
encoder_sa_kd.py:144-197 (KD capture variant — here a ``capture_kd`` flag on
the same forward, no duplicated module).  Config generality matches the
reference: ``econv_layers=0`` skips the conv stack (blstm input =
embed_dim), ``elayers=0`` skips the BiLSTM entirely (conv output passes
through, encoder_sa.py:96-99, 144-145), ``elayers>1`` stacks bidirectional
layers like torch ``nn.LSTM(num_layers=elayers)``, and
``use_batch_norm=False`` drops BN from the conv blocks (encoder_sa.py:63-93).

TPU-first: channels-last layout, BiLSTM as two lax.scans with hoisted input
GEMMs (ops/rnn.py), packed-sequence parity via masked state updates.
"""

from jax import random

from fcl_taco2_tpu.models import components as C
from fcl_taco2_tpu.ops.masking import lengths_to_non_pad_mask
from fcl_taco2_tpu.ops.rnn import bilstm_stack
from fcl_taco2_tpu.utils import initializers as init


def encoder_init(key, cfg):
    k_embed, k_convs, k_lstm = random.split(key, 3)
    params = {
        "embed": init.embedding_padded(0)(k_embed, (cfg.idim, cfg.embed_dim)),
    }
    state = {}
    if cfg.econv_layers > 0:
        conv_params, conv_state = C.conv_bn_stack_init(
            k_convs, cfg.econv_layers, cfg.embed_dim, cfg.econv_chans,
            cfg.econv_chans, cfg.econv_filts, init.RELU_GAIN,
            use_bn=cfg.use_batch_norm)
        params["convs"] = conv_params
        state["convs"] = conv_state
    if cfg.elayers > 0:
        lstm_in = cfg.econv_chans if cfg.econv_layers > 0 else cfg.embed_dim
        k_f, k_b = random.split(k_lstm)
        params["blstm_fwd"] = C.lstm_params_init(k_f, lstm_in,
                                                 cfg.eunits // 2)
        params["blstm_bwd"] = C.lstm_params_init(k_b, lstm_in,
                                                 cfg.eunits // 2)
        extra = []
        for _ in range(cfg.elayers - 1):
            k_lstm, k_f, k_b = random.split(k_lstm, 3)
            extra.append({
                "fwd": C.lstm_params_init(k_f, cfg.eunits, cfg.eunits // 2),
                "bwd": C.lstm_params_init(k_b, cfg.eunits, cfg.eunits // 2),
            })
        if extra:
            params["blstm_extra"] = extra
    return params, state


def _blstm_layers(params):
    layers = [(C.as_lstm(params["blstm_fwd"]), C.as_lstm(params["blstm_bwd"]))]
    for layer in params.get("blstm_extra", []):
        layers.append((C.as_lstm(layer["fwd"]), C.as_lstm(layer["bwd"])))
    return layers


def encoder_apply(params, state, cfg, tokens, ilens, rng, train,
                  capture_kd=False):
    """tokens (B, Tmax) int32 -> hs (B, Tmax, cfg.enc_odim).

    Returns (hs, new_state, kd_items) where kd_items is
    [embed, conv0, conv1, conv2, blstm] (encoder_sa_kd.py:196) or None.
    """
    x = params["embed"][tokens]  # (B, T, E); PAD row is zeros
    capture = [] if capture_kd else None
    if capture_kd:
        capture.append(x)
    new_state = {}
    if cfg.econv_layers > 0:
        # valid-position mask for BN statistics (padding would dilute them
        # under fixed-shape batching)
        seq_mask = lengths_to_non_pad_mask(
            ilens, tokens.shape[1]) if train else None
        x, conv_state = C.encoder_convs_apply(
            params["convs"], state["convs"], x, rng, cfg.dropout_rate, train,
            use_residual=cfg.use_residual, capture=capture, seq_mask=seq_mask)
        new_state["convs"] = conv_state
    if cfg.elayers > 0:
        x = bilstm_stack(_blstm_layers(params), x, ilens)
        if capture_kd:
            capture.append(x)
    return x, new_state, capture
