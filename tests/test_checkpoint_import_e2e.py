"""Imported-checkpoint evidence: a torch model whose MODULE TREE mirrors the
reference (so torch itself generates the state-dict key names — Sequential
indices, ModuleList nesting, ZoneOutCell .cell wrapper), randomly torch-
initialized, saved as an amp-style checkpoint, loaded through
``load_reference_checkpoint`` — and our ``synthesize`` must reproduce that
torch model's own forward pass.

Unlike tests/test_torch_parity.py (weights flow jax -> torch) this drives
the import path from a file written by torch.save with torch-authored keys,
pinning both the key layout (e2e_tts_tacotron2_sa.py module names) and the
weight-convention conversions end to end.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.utils.torch_import import load_reference_checkpoint

from helpers import tiny_config

ZONEOUT = 0.1


def cfg_nodrop():
    return tiny_config(
        dropout_rate=0.0, zoneout_rate=ZONEOUT,
        duration_predictor_dropout_rate=0.0,
        pitch_predictor_dropout_rate=0.0,
        energy_predictor_dropout_rate=0.0,
        pitch_embed_dropout_rate=0.0, energy_embed_dropout_rate=0.0)


# ---------------------------------------------------------------------
# reference-topology torch modules (names match e2e_tts_tacotron2_sa.py)
# ---------------------------------------------------------------------

class ChannelLayerNorm(torch.nn.LayerNorm):
    """espnet LayerNorm(dim=1): normalize channels of (B, C, T)."""

    def forward(self, x):
        return super().forward(x.transpose(1, -1)).transpose(1, -1)


class ZoneOutCell(torch.nn.Module):
    """reference decoder_sa.py:26-96 — wraps LSTMCell as .cell."""

    def __init__(self, cell):
        super().__init__()
        self.cell = cell

    def forward(self, x, hc):
        h, c = hc
        nh, nc = self.cell(x, hc)
        # eval-mode expectation blend (decoder_sa.py:96)
        return (ZONEOUT * h + (1 - ZONEOUT) * nh,
                ZONEOUT * c + (1 - ZONEOUT) * nc)


class RefEncoder(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.embed = torch.nn.Embedding(cfg.idim, cfg.embed_dim,
                                        padding_idx=0)
        convs, ich = [], cfg.embed_dim
        for _ in range(cfg.econv_layers):
            convs.append(torch.nn.Sequential(
                torch.nn.Conv1d(ich, cfg.econv_chans, cfg.econv_filts,
                                padding=cfg.econv_filts // 2, bias=False),
                torch.nn.BatchNorm1d(cfg.econv_chans),
                torch.nn.ReLU(), torch.nn.Dropout(0.0)))
            ich = cfg.econv_chans
        self.convs = torch.nn.ModuleList(convs)
        self.blstm = torch.nn.LSTM(ich, cfg.eunits // 2, cfg.elayers,
                                   batch_first=True, bidirectional=True)

    def forward(self, x, ilens):
        x = self.embed(x).transpose(1, 2)
        for conv in self.convs:
            x = conv(x)
        x = x.transpose(1, 2)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, ilens, batch_first=True, enforce_sorted=False)
        out, _ = self.blstm(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=x.shape[1])
        return out


class RefVariancePredictor(torch.nn.Module):
    def __init__(self, idim, n_layers, chans, kernel):
        super().__init__()
        convs, ich = [], idim
        for _ in range(n_layers):
            convs.append(torch.nn.Sequential(
                torch.nn.Conv1d(ich, chans, kernel, padding=kernel // 2),
                torch.nn.ReLU(),
                ChannelLayerNorm(chans, eps=1e-12),
                torch.nn.Dropout(0.0)))
            ich = chans
        self.conv = torch.nn.ModuleList(convs)
        self.linear = torch.nn.Linear(chans, 1)

    def forward(self, x, pad_mask):
        h = x.transpose(1, 2)
        for c in self.conv:
            h = c(h)
        out = self.linear(h.transpose(1, 2))
        return out.masked_fill(pad_mask[..., None], 0.0)


class RefPrenet(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        layers, ich = [], cfg.odim
        for _ in range(cfg.prenet_layers):
            layers.append(torch.nn.Sequential(
                torch.nn.Linear(ich, cfg.prenet_units), torch.nn.ReLU()))
            ich = cfg.prenet_units
        self.prenet = torch.nn.ModuleList(layers)

    def forward(self, x):
        for layer in self.prenet:
            x = layer(x)  # dropout rate 0 in this parity config
        return x


class RefPostnet(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        layers = []
        for i in range(cfg.postnet_layers):
            ich = cfg.odim if i == 0 else cfg.postnet_chans
            och = cfg.odim if i == cfg.postnet_layers - 1 \
                else cfg.postnet_chans
            mods = [torch.nn.Conv1d(ich, och, cfg.postnet_filts,
                                    padding=cfg.postnet_filts // 2,
                                    bias=False),
                    torch.nn.BatchNorm1d(och)]
            if i < cfg.postnet_layers - 1:
                mods.append(torch.nn.Tanh())
            mods.append(torch.nn.Dropout(0.0))
            layers.append(torch.nn.Sequential(*mods))
        self.postnet = torch.nn.ModuleList(layers)

    def forward(self, x_bct, seq_mask=None):
        for layer in self.postnet:
            x_bct = layer(x_bct)
            if seq_mask is not None:
                x_bct = x_bct * seq_mask[:, None, :]
        return x_bct


class RefDecoder(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.prenet = RefPrenet(cfg)
        lstms, ich = [], cfg.eunits + cfg.prenet_units + 1
        for _ in range(cfg.dlayers):
            lstms.append(ZoneOutCell(torch.nn.LSTMCell(ich, cfg.dunits)))
            ich = cfg.dunits
        self.lstm = torch.nn.ModuleList(lstms)
        self.feat_out = torch.nn.Linear(cfg.dunits + cfg.eunits, cfg.odim,
                                        bias=False)
        self.postnet = RefPostnet(cfg)

    def ar_decode(self, enc_seg, position, D, odim):
        P = enc_seg.shape[0]
        hc = [(torch.zeros(P, self.lstm[0].cell.hidden_size),
               torch.zeros(P, self.lstm[0].cell.hidden_size))
              for _ in self.lstm]
        prev = torch.zeros(P, odim)
        outs = []
        for step in range(D):
            xs = torch.cat([enc_seg, self.prenet(prev),
                            position[:, step:step + 1]], dim=1)
            for li, cell in enumerate(self.lstm):
                hc[li] = cell(xs if li == 0 else hc[li - 1][0], hc[li])
            out = self.feat_out(torch.cat([hc[-1][0], enc_seg], dim=1))
            outs.append(out)
            prev = out
        return torch.stack(outs, dim=1)  # (P, D, odim)


class RefModel(torch.nn.Module):
    """attribute names = reference's (e2e_tts_tacotron2_sa.py:289-517)."""

    def __init__(self, cfg):
        super().__init__()
        self.enc = RefEncoder(cfg)
        self.duration_predictor = RefVariancePredictor(
            cfg.eunits, cfg.duration_predictor_layers,
            cfg.duration_predictor_chans,
            cfg.duration_predictor_kernel_size)
        self.pitch_predictor = RefVariancePredictor(
            cfg.eunits, cfg.pitch_predictor_layers,
            cfg.pitch_predictor_chans, cfg.pitch_predictor_kernel_size)
        self.energy_predictor = RefVariancePredictor(
            cfg.eunits, cfg.energy_predictor_layers,
            cfg.energy_predictor_chans, cfg.energy_predictor_kernel_size)
        self.pitch_embed = torch.nn.Sequential(
            torch.nn.Conv1d(1, cfg.eunits, cfg.pitch_embed_kernel_size,
                            padding=cfg.pitch_embed_kernel_size // 2),
            torch.nn.Dropout(0.0))
        self.energy_embed = torch.nn.Sequential(
            torch.nn.Conv1d(1, cfg.eunits, cfg.energy_embed_kernel_size,
                            padding=cfg.energy_embed_kernel_size // 2),
            torch.nn.Dropout(0.0))
        self.dec = RefDecoder(cfg)

    def randomize(self, seed):
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in self.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.3)
            for m in self.modules():
                if isinstance(m, torch.nn.BatchNorm1d):
                    m.running_mean.copy_(
                        torch.randn(m.running_mean.shape, generator=g) * 0.2)
                    m.running_var.copy_(
                        torch.rand(m.running_var.shape, generator=g) + 0.5)

    def inference(self, tokens, ilens, durs, F, cfg):
        hs = self.enc(tokens, ilens)
        Tmax = tokens.shape[1]
        pad = torch.arange(Tmax)[None, :] >= ilens[:, None]
        d_log = self.duration_predictor(hs, pad)[..., 0]
        d_pred = torch.clamp(
            torch.round(torch.exp(d_log) - 1), min=0).long()
        p_outs = self.pitch_predictor(hs, pad)
        e_outs = self.energy_predictor(hs, pad)
        hs = hs + self.pitch_embed(p_outs.transpose(1, 2)).transpose(1, 2) \
            + self.energy_embed(e_outs.transpose(1, 2)).transpose(1, 2)
        n = int(ilens[0])
        ds = durs[0, :n].tolist()
        enc_seg = hs[0, :n]
        D = cfg.max_dur
        position = torch.zeros(n, D)
        for i, d in enumerate(ds):
            if d:
                position[i, :d] = torch.arange(d) / d
        seg = self.dec.ar_decode(enc_seg, position, D, cfg.odim).numpy()
        mel = np.zeros((1, F, cfg.odim), np.float32)
        pos = 0
        for i, d in enumerate(ds):
            mel[0, pos:pos + d] = seg[i, :d]
            pos += d
        L = pos
        seq_mask = torch.from_numpy(
            (np.arange(F)[None] < L).astype(np.float32))
        after = torch.from_numpy(mel) + self.dec.postnet(
            torch.from_numpy(mel).transpose(1, 2),
            seq_mask=seq_mask).transpose(1, 2)
        after = after * seq_mask[..., None]
        return after.numpy()[0], L, d_pred


def test_amp_checkpoint_import_reproduces_torch_forward(tmp_path):
    cfg = cfg_nodrop()
    tm = RefModel(cfg)
    tm.randomize(11)
    tm.eval()
    path = str(tmp_path / "amp_checkpoint_900.pt")
    torch.save({"model": tm.state_dict(), "optimizer": {}, "amp": {}}, path)

    params, state = load_reference_checkpoint(path, cfg)
    # BN state must come from the file, not from init
    np.testing.assert_allclose(
        np.asarray(state["encoder"]["convs"]["bns"][0]["mean"]),
        tm.enc.convs[0][1].running_mean.numpy())

    tokens = np.array([[1, 4, 2, 3, 0, 0]], np.int32)
    ilens = np.array([4], np.int32)
    durs = np.array([[3, 2, 4, 1, 0, 0]], np.int32)
    F = 16
    model = Tacotron2SA(cfg)
    out = model.synthesize(
        params, jax.tree_util.tree_map(jnp.asarray, state),
        jnp.asarray(tokens), jnp.asarray(ilens), jax.random.PRNGKey(0),
        frame_budget=F, durations=jnp.asarray(durs))
    with torch.no_grad():
        mel_t, L, d_pred = tm.inference(
            torch.from_numpy(tokens).long(), torch.from_numpy(ilens).long(),
            torch.from_numpy(durs).long(), F, cfg)

    assert int(out["olens"][0]) == L == 10
    np.testing.assert_allclose(np.asarray(out["mel"])[0], mel_t, atol=3e-4)

    # duration-predictor inference from the same imported weights must
    # round identically (clamped round(exp - 1), reference espnet semantics)
    out2 = model.synthesize(
        params, jax.tree_util.tree_map(jnp.asarray, state),
        jnp.asarray(tokens), jnp.asarray(ilens), jax.random.PRNGKey(0),
        frame_budget=F)
    np.testing.assert_array_equal(
        np.asarray(out2["d_outs"])[0, :4],
        np.minimum(d_pred.numpy()[0, :4], cfg.max_dur))
