"""Shared network components as pure functions over parameter pytrees.

Parameters are plain nested dicts of jnp arrays (optax/checkpoint friendly);
BatchNorm running statistics live in a parallel "state" pytree that forward
passes thread through in train mode.

Components and their reference counterparts:
- prenet            decoder_sa.py:99-158   (always-on dropout, even in eval)
- postnet           decoder_sa.py:161-286  (5x conv-BN-tanh-dropout, last
                                            layer no tanh)
- conv_bn stack     encoder_sa.py:59-93    (conv-BN-relu-dropout)
- variance predictor variance_predictor.py:14-95 (conv-relu-LN-dropout + lin)
- duration predictor espnet fastspeech DurationPredictor: same conv stack,
                     linear->1, log-domain with offset, round at inference
                     (used at e2e_tts_tacotron2_sa.py:406-414, 641-646)
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import random

from fcl_taco2_tpu.ops.conv import (BatchNormParams, BatchNormState,
                                    batch_norm, conv1d, layer_norm)
from fcl_taco2_tpu.ops.rnn import LSTMParams
from fcl_taco2_tpu.utils import initializers as init

Params = Dict[str, Any]


def _dropout(rng, x, rate):
    """Inverted dropout (torch F.dropout parity: scale by 1/(1-p))."""
    if rate <= 0.0:
        return x
    keep = random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def maybe_dropout(rng, x, rate, train):
    return _dropout(rng, x, rate) if (train and rate > 0.0) else x


def _split(rng):
    """Split an optional rng; (None, None) when not training."""
    if rng is None:
        return None, None
    return random.split(rng)


# --------------------------------------------------------------------------
# Prenet
# --------------------------------------------------------------------------

def prenet_init(key, idim, n_layers, n_units):
    layers = []
    for i in range(n_layers):
        key, k1, k2 = random.split(key, 3)
        d_in = idim if i == 0 else n_units
        layers.append({
            "w": init.linear_weight(k1, (d_in, n_units)),
            "b": init.linear_bias(d_in)(k2, (n_units,)),
        })
    return {"layers": layers}


def prenet_apply(params, x, rng, dropout_rate):
    """Prenet with ALWAYS-ON dropout (reference decoder_sa.py:109-112,
    146-158: F.dropout with training=True in both train and eval)."""
    for i, layer in enumerate(params["layers"]):
        rng, sub = random.split(rng)
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
        x = _dropout(sub, x, dropout_rate)
    return x


# --------------------------------------------------------------------------
# Conv-BN stacks (encoder convs + postnet)
# --------------------------------------------------------------------------

def conv_bn_stack_init(key, n_layers, in_ch, hidden_ch, out_ch, width, gain,
                       last_is_out=False, use_bn=True):
    """n_layers of conv(width)->BN. If last_is_out, the final layer maps to
    out_ch (postnet shape: odim->chans->...->odim, decoder_sa.py:198-263).
    ``use_bn=False`` drops the BN blocks (encoder_sa.py:63-93,
    decoder_sa.py:203-263 else-branches)."""
    convs, bns, bn_states = [], [], []
    for i in range(n_layers):
        key, sub = random.split(key)
        ichans = in_ch if i == 0 else hidden_ch
        ochans = out_ch if (last_is_out and i == n_layers - 1) else hidden_ch
        convs.append({
            "kernel": init.xavier_uniform_conv(gain)(
                sub, (width, ichans, ochans)),
        })
        if use_bn:
            bns.append(BatchNormParams(scale=jnp.ones(ochans),
                                       bias=jnp.zeros(ochans))._asdict())
            bn_states.append(BatchNormState(mean=jnp.zeros(ochans),
                                            var=jnp.ones(ochans))._asdict())
    return {"convs": convs, "bns": bns}, {"bns": bn_states}


def _bn(x, p, s, train, mask=None):
    y, ns = batch_norm(
        x, BatchNormParams(**p), BatchNormState(**s), train=train,
        mask=mask)
    return y, ns._asdict()


def encoder_convs_apply(params, state, x, rng, dropout_rate, train,
                        use_residual=False, capture=None, seq_mask=None):
    """conv->BN->ReLU->dropout stack (encoder_sa.py:134-140). ``capture``
    collects per-layer outputs for KD (encoder_sa_kd.py:157-171);
    ``seq_mask`` (B, T) keeps BN statistics on valid positions."""
    new_states = []
    use_bn = len(params["bns"]) > 0
    for i, conv in enumerate(params["convs"]):
        rng, sub = _split(rng)
        h = conv1d(x, conv["kernel"])
        if use_bn:
            h, ns = _bn(h, params["bns"][i], state["bns"][i], train,
                        mask=seq_mask)
            new_states.append(ns)
        h = jax.nn.relu(h)
        h = maybe_dropout(sub, h, dropout_rate, train)
        x = (x + h) if use_residual else h
        if capture is not None:
            capture.append(x)
    return x, {"bns": new_states}


def postnet_apply(params, state, x, rng, dropout_rate, train, capture=None,
                  seq_mask=None):
    """conv->BN->tanh->dropout x(n-1), final conv->BN->dropout (no tanh)
    (decoder_sa.py:274-286). Returns the residual-correction signal; caller
    adds it to before_outs. ``capture`` collects per-layer outs for KD
    (decoder_sa_kd.py:334-352 Postnet returning all five conv outputs).

    ``seq_mask`` (B, T) zeroes activations past each utterance's length
    between layers; with it, a padded batch reproduces the reference's
    exact-length batch-1 inference (finite array + zero conv padding)."""
    n = len(params["convs"])
    new_bns = []
    use_bn = len(params["bns"]) > 0
    for i, conv in enumerate(params["convs"]):
        rng, sub = _split(rng)
        x = conv1d(x, conv["kernel"])
        if use_bn:
            x, ns = _bn(x, params["bns"][i], state["bns"][i], train,
                        mask=seq_mask)
            new_bns.append(ns)
        if i < n - 1:
            x = jnp.tanh(x)
        x = maybe_dropout(sub, x, dropout_rate, train)
        if seq_mask is not None:
            x = x * seq_mask[..., None].astype(x.dtype)
        if capture is not None:
            capture.append(x)
    return x, {"bns": new_bns}


# --------------------------------------------------------------------------
# Variance / duration predictors
# --------------------------------------------------------------------------

def variance_predictor_init(key, idim, n_layers, n_chans, kernel_size,
                            output_dim=1):
    convs, lns = [], []
    for i in range(n_layers):
        key, k1, k2 = random.split(key, 3)
        in_ch = idim if i == 0 else n_chans
        convs.append({
            "kernel": init.conv_kernel_torch(
                k1, (kernel_size, in_ch, n_chans)),
            "bias": init.conv_bias_torch(in_ch, kernel_size)(
                k2, (n_chans,)),
        })
        lns.append({"scale": jnp.ones(n_chans), "bias": jnp.zeros(n_chans)})
    key, k1, k2 = random.split(key, 3)
    linear = {"w": init.linear_weight(k1, (n_chans, output_dim)),
              "b": init.linear_bias(n_chans)(k2, (output_dim,))}
    return {"convs": convs, "lns": lns, "linear": linear}


def variance_predictor_apply(params, x, pad_mask, rng, dropout_rate, train):
    """(B, T, idim) -> (B, T, output_dim); padded positions zeroed
    (variance_predictor.py:74-95)."""
    for conv, ln in zip(params["convs"], params["lns"]):
        rng, sub = _split(rng)
        x = conv1d(x, conv["kernel"], conv["bias"])
        x = jax.nn.relu(x)
        x = layer_norm(x, ln["scale"], ln["bias"])
        x = maybe_dropout(sub, x, dropout_rate, train)
    x = x @ params["linear"]["w"] + params["linear"]["b"]
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], 0.0, x)
    return x


def duration_predictor_apply(params, x, pad_mask, rng, dropout_rate, train):
    """Log-domain duration prediction (espnet DurationPredictor.forward):
    conv-relu-LN-dropout stack + linear -> (B, T), masked_fill 0 at pads."""
    out = variance_predictor_apply(params, x, None, rng, dropout_rate, train)
    out = out[..., 0]
    if pad_mask is not None:
        out = jnp.where(pad_mask, 0.0, out)
    return out


def duration_predictor_inference(params, x, pad_mask, offset=1.0):
    """espnet DurationPredictor.inference: round(exp(logd) - offset),
    clamp min 0, int."""
    logd = variance_predictor_apply(params, x, None, None, 0.0, False)[..., 0]
    d = jnp.clip(jnp.round(jnp.exp(logd) - offset), 0, None).astype(jnp.int32)
    if pad_mask is not None:
        d = jnp.where(pad_mask, 0, d)
    return d


def duration_loss(logd_pred, targets_dur, mask, offset=1.0,
                  weighted_n_valid=None):
    """espnet DurationPredictorLoss: MSE in log domain with offset, masked
    mean (e2e_tts_tacotron2_sa.py:559-565).

    ``weighted_n_valid`` switches to the use_weighted_masking reduction
    (tokens weighted per-utterance by 1/ilens, utterances equally) — the
    natural extension of Tacotron2Loss:72-80; the reference's own weighted
    duration path returns an unreduced vector (reduction='none' never
    re-reduced, :413-414 + :563-565) and would crash at .item()."""
    from fcl_taco2_tpu.ops.masking import weighted_masked_sum
    target = jnp.log(targets_dur.astype(logd_pred.dtype) + offset)
    diff = (logd_pred - target) ** 2
    if weighted_n_valid is not None:
        return weighted_masked_sum(diff, mask, weighted_n_valid)
    mask_f = mask.astype(logd_pred.dtype)
    return jnp.sum(diff * mask_f) / jnp.maximum(jnp.sum(mask_f), 1.0)


# --------------------------------------------------------------------------
# Pitch/energy embedding (conv k=9 + dropout, e2e_tts_tacotron2_sa.py:435-443)
# --------------------------------------------------------------------------

def scalar_embed_init(key, out_dim, kernel_size):
    k1, k2 = random.split(key)
    return {
        "kernel": init.conv_kernel_torch(k1, (kernel_size, 1, out_dim)),
        "bias": init.conv_bias_torch(1, kernel_size)(k2, (out_dim,)),
    }


def scalar_embed_apply(params, x, rng, dropout_rate, train):
    """(B, T, 1) scalar track -> (B, T, out_dim)."""
    out = conv1d(x, params["kernel"], params["bias"])
    return maybe_dropout(rng, out, dropout_rate, train)


# --------------------------------------------------------------------------
# LSTM param init helpers
# --------------------------------------------------------------------------

def lstm_params_init(key, in_dim, hidden):
    k1, k2, k3, k4 = random.split(key, 4)
    u = init.lstm_uniform(hidden)
    return LSTMParams(
        wx=u(k1, (in_dim, 4 * hidden)),
        wh=u(k2, (hidden, 4 * hidden)),
        bx=u(k3, (4 * hidden,)),
        bh=u(k4, (4 * hidden,)),
    )._asdict()


def as_lstm(p):
    return LSTMParams(**p)
