"""Conv1d / BatchNorm / LayerNorm parity vs torch."""

import numpy as np
import torch
import jax.numpy as jnp

from fcl_taco2_tpu.ops.conv import (BatchNormParams, BatchNormState,
                                    batch_norm, conv1d, layer_norm)


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    conv = torch.nn.Conv1d(6, 10, 5, padding=2, bias=True)
    x = torch.randn(2, 6, 9)  # (B, C, T) torch layout
    out_t = conv(x).detach().numpy()

    kernel = jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0))
    bias = jnp.asarray(conv.bias.detach().numpy())
    out_j = conv1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), kernel, bias)
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1), out_t,
                               atol=1e-5)


def test_batch_norm_train_and_eval_match_torch():
    torch.manual_seed(1)
    bn = torch.nn.BatchNorm1d(4)
    x = torch.randn(3, 4, 7)

    bn.train()
    out_train = bn(x).detach().numpy()
    running_mean = bn.running_mean.detach().numpy().copy()
    running_var = bn.running_var.detach().numpy().copy()
    bn.eval()
    out_eval = bn(x).detach().numpy()

    params = BatchNormParams(
        scale=jnp.asarray(bn.weight.detach().numpy()),
        bias=jnp.asarray(bn.bias.detach().numpy()))
    state0 = BatchNormState(mean=jnp.zeros(4), var=jnp.ones(4))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))  # (B, T, C)

    yj, state1 = batch_norm(xj, params, state0, train=True)
    np.testing.assert_allclose(np.asarray(yj).transpose(0, 2, 1), out_train,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(state1.mean), running_mean,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(state1.var), running_var, atol=1e-4)

    yj2, _ = batch_norm(xj, params, state1, train=False)
    np.testing.assert_allclose(np.asarray(yj2).transpose(0, 2, 1), out_eval,
                               atol=1e-5)


def test_layer_norm_matches_torch_espnet_eps():
    torch.manual_seed(2)
    ln = torch.nn.LayerNorm(12, eps=1e-12)  # espnet LayerNorm uses 1e-12
    x = torch.randn(3, 5, 12)
    out_t = ln(x).detach().numpy()
    out_j = layer_norm(jnp.asarray(x.numpy()),
                       jnp.asarray(ln.weight.detach().numpy()),
                       jnp.asarray(ln.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-5)
