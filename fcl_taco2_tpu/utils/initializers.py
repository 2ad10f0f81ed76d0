"""Parameter initializers matching the reference's torch init distributions.

The reference relies on torch defaults plus explicit xavier-uniform for convs
(reference: nets/modules/encoder_sa.py:15-18 relu gain,
nets/modules/decoder_sa.py:20-23 tanh gain).  Matching the init
*distributions* (not values) keeps training dynamics comparable and lets us
import torch checkpoints without rescaling.

torch defaults being reproduced:
- ``nn.Linear``: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ...) for
  weight, U(-1/sqrt(fan_in), ...) for bias
- ``nn.LSTM``/``nn.LSTMCell``: U(-1/sqrt(hidden), 1/sqrt(hidden)) everywhere
- ``nn.Embedding``: N(0, 1), padding row zeroed
- ``nn.Conv1d`` with xavier_uniform(gain): U(-g*sqrt(6/(fan_in+fan_out)), ...)
  where fan counts include the kernel width
"""

import math

import jax.numpy as jnp
from jax import random


def linear_weight(key, shape, dtype=jnp.float32):
    """Torch nn.Linear default weight init for a (fan_in, fan_out) kernel."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def linear_bias(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def lstm_uniform(hidden_size):
    """Torch nn.LSTMCell default: U(-1/sqrt(H), 1/sqrt(H)) for all tensors."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(hidden_size)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_conv(gain):
    """Xavier-uniform for a conv kernel stored as (width, in_ch, out_ch)."""

    def init(key, shape, dtype=jnp.float32):
        width, in_ch, out_ch = shape
        fan_in = in_ch * width
        fan_out = out_ch * width
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv_kernel_torch(key, shape, dtype=jnp.float32):
    """Torch nn.Conv1d default weight: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)), fan_in = in_ch * width.
    Kernel stored as (width, in_ch, out_ch)."""
    width, in_ch, _ = shape
    bound = 1.0 / math.sqrt(in_ch * width)
    return random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_torch(in_ch, width):
    """Torch nn.Conv1d default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(in_ch * width)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


RELU_GAIN = math.sqrt(2.0)
TANH_GAIN = 5.0 / 3.0


def embedding_padded(padding_idx=0):
    """Torch nn.Embedding default: N(0,1) rows, padding row zeroed."""

    def init(key, shape, dtype=jnp.float32):
        emb = random.normal(key, shape, dtype)
        return emb.at[padding_idx].set(0.0)

    return init
