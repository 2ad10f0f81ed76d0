"""LSTM / BiLSTM parity vs torch (golden-value tests, fp32 CPU).

The reference uses torch.nn.LSTMCell in the decoder
(nets/modules/decoder_sa.py:366) and a packed bidirectional torch.nn.LSTM in
the encoder (nets/modules/encoder_sa.py:98-146).  These tests pin our
lax.scan implementations to torch numerics.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from fcl_taco2_tpu.ops.rnn import LSTMParams, lstm_cell, lstm_scan, bilstm


def torch_cell_to_params(cell):
    return LSTMParams(
        wx=jnp.asarray(cell.weight_ih.detach().numpy().T),
        wh=jnp.asarray(cell.weight_hh.detach().numpy().T),
        bx=jnp.asarray(cell.bias_ih.detach().numpy()),
        bh=jnp.asarray(cell.bias_hh.detach().numpy()),
    )


def test_lstm_cell_matches_torch():
    torch.manual_seed(0)
    cell = torch.nn.LSTMCell(12, 24)
    x = torch.randn(5, 12)
    h = torch.randn(5, 24)
    c = torch.randn(5, 24)
    h_t, c_t = cell(x, (h, c))

    params = torch_cell_to_params(cell)
    h_j, c_j = lstm_cell(params, jnp.asarray(x.numpy()), jnp.asarray(h.numpy()),
                         jnp.asarray(c.numpy()))
    np.testing.assert_allclose(np.asarray(h_j), h_t.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.detach().numpy(),
                               atol=1e-5)


def test_lstm_scan_matches_torch_unidirectional():
    torch.manual_seed(1)
    lstm = torch.nn.LSTM(8, 16, batch_first=True)
    x = torch.randn(3, 7, 8)
    out_t, _ = lstm(x)

    params = LSTMParams(
        wx=jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
        wh=jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
        bx=jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
        bh=jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
    )
    out_j, _ = lstm_scan(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               atol=1e-5)


@pytest.mark.parametrize("lengths", [[7, 5, 3], [4, 4, 4]])
def test_bilstm_matches_torch_packed(lengths):
    """Packed-sequence parity incl. zero outputs at padding."""
    torch.manual_seed(2)
    B, T, D, H = 3, 7, 8, 10
    lstm = torch.nn.LSTM(D, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lengths, batch_first=True, enforce_sorted=False)
    out_p, _ = lstm(packed)
    out_t, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_p, batch_first=True, total_length=T)

    def par(sfx):
        return LSTMParams(
            wx=jnp.asarray(getattr(lstm, f"weight_ih_l0{sfx}").detach().numpy().T),
            wh=jnp.asarray(getattr(lstm, f"weight_hh_l0{sfx}").detach().numpy().T),
            bx=jnp.asarray(getattr(lstm, f"bias_ih_l0{sfx}").detach().numpy()),
            bh=jnp.asarray(getattr(lstm, f"bias_hh_l0{sfx}").detach().numpy()),
        )

    out_j = bilstm(par(""), par("_reverse"), jnp.asarray(x.numpy()),
                   jnp.asarray(np.array(lengths, np.int32)))
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               atol=1e-5)
