"""Full-model numerical parity against an independently-written torch
mirror of the reference architecture (eval mode, dropout disabled).

This pins every module's math end-to-end — encoder, variance adaptor,
teacher-forced decoder (with zoneout eval blend), postnet, AR inference —
so MCD-parity claims rest on tested numerics (SURVEY.md hard part #3).
Weights flow jax -> torch, inputs are identical, outputs must agree to
fp32 tolerance.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.models.taco2_sa import Batch

from helpers import synthetic_batch, tiny_config

ZONEOUT = 0.1


def cfg_nodrop():
    return tiny_config(
        dropout_rate=0.0, zoneout_rate=ZONEOUT,
        duration_predictor_dropout_rate=0.0,
        pitch_predictor_dropout_rate=0.0,
        energy_predictor_dropout_rate=0.0,
        pitch_embed_dropout_rate=0.0, energy_embed_dropout_rate=0.0)


# ------------------------------------------------------------------
# torch mirror (independent implementation, weights copied from jax)
# ------------------------------------------------------------------

def t(x):
    return torch.from_numpy(np.asarray(x))


class TorchMirror:
    def __init__(self, cfg, params, state):
        self.cfg = cfg
        self.p = params
        self.s = state

    # ----- encoder -----
    def encoder(self, tokens, ilens):
        p = self.p["encoder"]
        x = t(p["embed"])[tokens]  # (B, T, E)
        x = x.transpose(1, 2)
        for i, conv in enumerate(p["convs"]["convs"]):
            w = t(conv["kernel"]).permute(2, 1, 0)  # (Cout, Cin, W)
            x = torch.nn.functional.conv1d(x, w, padding=w.shape[2] // 2)
            bn = p["convs"]["bns"][i]
            st = self.s["encoder"]["convs"]["bns"][i]
            x = torch.nn.functional.batch_norm(
                x, t(st["mean"]), t(st["var"]), t(bn["scale"]), t(bn["bias"]),
                training=False)
            x = torch.relu(x)
        x = x.transpose(1, 2)
        lstm = torch.nn.LSTM(x.shape[-1], self.cfg.eunits // 2,
                             batch_first=True, bidirectional=True)
        with torch.no_grad():
            for sfx, pp in [("", p["blstm_fwd"]), ("_reverse",
                                                   p["blstm_bwd"])]:
                getattr(lstm, f"weight_ih_l0{sfx}").copy_(t(pp["wx"]).T)
                getattr(lstm, f"weight_hh_l0{sfx}").copy_(t(pp["wh"]).T)
                getattr(lstm, f"bias_ih_l0{sfx}").copy_(t(pp["bx"]))
                getattr(lstm, f"bias_hh_l0{sfx}").copy_(t(pp["bh"]))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, ilens, batch_first=True, enforce_sorted=False)
        out, _ = lstm(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=x.shape[1])
        return out

    # ----- variance predictor (shared shape for dur/pitch/energy) -----
    def variance(self, p, x, pad_mask):
        h = x.transpose(1, 2)
        for conv, ln in zip(p["convs"], p["lns"]):
            w = t(conv["kernel"]).permute(2, 1, 0)
            h = torch.nn.functional.conv1d(h, w, t(conv["bias"]),
                                           padding=w.shape[2] // 2)
            h = torch.relu(h)
            h = h.transpose(1, 2)
            h = torch.nn.functional.layer_norm(
                h, (h.shape[-1],), t(ln["scale"]), t(ln["bias"]), eps=1e-12)
            h = h.transpose(1, 2)
        out = h.transpose(1, 2) @ t(p["linear"]["w"]) + t(p["linear"]["b"])
        return out.masked_fill(torch.from_numpy(pad_mask)[..., None], 0.0)

    def scalar_embed(self, p, x):
        w = t(p["kernel"]).permute(2, 1, 0)
        return torch.nn.functional.conv1d(
            x.transpose(1, 2), w, t(p["bias"]),
            padding=w.shape[2] // 2).transpose(1, 2)

    # ----- decoder -----
    def _cells(self):
        d = self.p["decoder"]
        cells = []
        for name in ("lstm0", "lstm1"):
            pp = d[name]
            cell = torch.nn.LSTMCell(pp["wx"].shape[0], pp["wh"].shape[0])
            with torch.no_grad():
                cell.weight_ih.copy_(t(pp["wx"]).T)
                cell.weight_hh.copy_(t(pp["wh"]).T)
                cell.bias_ih.copy_(t(pp["bx"]))
                cell.bias_hh.copy_(t(pp["bh"]))
            cells.append(cell)
        return cells

    def _prenet(self, x):
        for layer in self.p["decoder"]["prenet"]["layers"]:
            x = torch.relu(x @ t(layer["w"]) + t(layer["b"]))
        return x  # dropout rate 0 in the parity config

    def postnet(self, x_blc, seq_mask=None):
        d = self.p["decoder"]["postnet"]
        st = self.s["decoder"]["postnet"]["bns"]
        h = x_blc.transpose(1, 2)
        n = len(d["convs"])
        for i, conv in enumerate(d["convs"]):
            w = t(conv["kernel"]).permute(2, 1, 0)
            h = torch.nn.functional.conv1d(h, w, padding=w.shape[2] // 2)
            bn = d["bns"][i]
            h = torch.nn.functional.batch_norm(
                h, t(st[i]["mean"]), t(st[i]["var"]), t(bn["scale"]),
                t(bn["bias"]), training=False)
            if i < n - 1:
                h = torch.tanh(h)
            if seq_mask is not None:
                h = h * torch.from_numpy(seq_mask)[:, None, :]
        return h.transpose(1, 2)

    def decoder_tf(self, enc_seg, seg_targets, position):
        """Teacher-forced phoneme-batch decode, zoneout EVAL blend
        (reference decoder_sa.py:96 else-branch)."""
        cells = self._cells()
        P, D, odim = seg_targets.shape
        H = self.cfg.dunits
        z0 = torch.zeros(P, H)
        c0 = torch.zeros(P, H)
        z1 = torch.zeros(P, H)
        c1 = torch.zeros(P, H)
        prev = torch.zeros(P, odim)
        w_out = t(self.p["decoder"]["feat_out"]["w"])
        outs = []
        for step in range(D):
            pn = self._prenet(prev)
            xs = torch.cat([enc_seg, pn, position[:, step:step + 1]], dim=1)
            nz0, nc0 = cells[0](xs, (z0, c0))
            z0 = ZONEOUT * z0 + (1 - ZONEOUT) * nz0
            c0 = ZONEOUT * c0 + (1 - ZONEOUT) * nc0
            nz1, nc1 = cells[1](z0, (z1, c1))
            z1 = ZONEOUT * z1 + (1 - ZONEOUT) * nz1
            c1 = ZONEOUT * c1 + (1 - ZONEOUT) * nc1
            outs.append(torch.cat([z1, enc_seg], dim=1) @ w_out)
            prev = seg_targets[:, step]
        return torch.stack(outs, dim=1)  # (P, D, odim)

    def decoder_ar(self, enc_seg, position, D):
        cells = self._cells()
        P = enc_seg.shape[0]
        H = self.cfg.dunits
        z0 = torch.zeros(P, H)
        c0 = torch.zeros(P, H)
        z1 = torch.zeros(P, H)
        c1 = torch.zeros(P, H)
        prev = torch.zeros(P, self.cfg.odim)
        w_out = t(self.p["decoder"]["feat_out"]["w"])
        outs = []
        for step in range(D):
            pn = self._prenet(prev)
            xs = torch.cat([enc_seg, pn, position[:, step:step + 1]], dim=1)
            nz0, nc0 = cells[0](xs, (z0, c0))
            z0 = ZONEOUT * z0 + (1 - ZONEOUT) * nz0
            c0 = ZONEOUT * c0 + (1 - ZONEOUT) * nc0
            nz1, nc1 = cells[1](z0, (z1, c1))
            z1 = ZONEOUT * z1 + (1 - ZONEOUT) * nz1
            c1 = ZONEOUT * c1 + (1 - ZONEOUT) * nc1
            out = torch.cat([z1, enc_seg], dim=1) @ w_out
            outs.append(out)
            prev = out
        return torch.stack(outs, dim=1)


@pytest.fixture(scope="module")
def setup():
    cfg = cfg_nodrop()
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg, B=3, Tmax=5)
    mirror = TorchMirror(cfg, jax.tree_util.tree_map(np.asarray, params),
                         jax.tree_util.tree_map(np.asarray, state))
    return cfg, model, params, state, batch, mirror


def test_teacher_forced_mel_parity(setup):
    cfg, model, params, state, batch, mirror = setup
    # jax forward (eval mode = deterministic with dropout 0 + zoneout blend)
    loss, (report, _, know) = model.loss_fn(
        params, state, batch, jax.random.PRNGKey(1), train=False,
        capture_kd=True)
    after_j = np.asarray(know["after_outs"])
    before_j = np.asarray(know["before_outs"])

    # torch mirror forward
    with torch.no_grad():
        tokens = torch.from_numpy(np.asarray(batch.tokens)).long()
        ilens = torch.from_numpy(np.asarray(batch.ilens)).long()
        hs = mirror.encoder(tokens, ilens)
        p_embs = mirror.scalar_embed(mirror.p["pitch_embed"],
                                     t(batch.f0))
        e_embs = mirror.scalar_embed(mirror.p["energy_embed"],
                                     t(batch.energy))
        hs_cond = hs + p_embs + e_embs
        seg_utt = np.asarray(batch.seg_utt)
        seg_tok = np.asarray(batch.seg_tok)
        enc_seg = hs_cond[seg_utt, seg_tok]
        seg_targets = np.zeros(
            (len(seg_utt), cfg.max_dur, cfg.odim), np.float32)
        mel = np.asarray(batch.mel)
        seg_start = np.asarray(batch.seg_start)
        fm = np.asarray(batch.frame_mask)
        for i in range(len(seg_utt)):
            d = int(fm[i].sum())
            seg_targets[i, :d] = mel[seg_utt[i],
                                     seg_start[i]:seg_start[i] + d]
        seg_out = mirror.decoder_tf(enc_seg, torch.from_numpy(seg_targets),
                                    t(batch.position))
        # regroup with the same plan
        flat = seg_out.reshape(-1, cfg.odim).numpy()
        before_t = flat[np.asarray(batch.utt_gather)]
        before_t *= np.asarray(batch.utt_mask)[..., None]
        after_t = before_t + mirror.postnet(
            torch.from_numpy(before_t)).numpy()

    np.testing.assert_allclose(before_j, before_t, atol=2e-4)
    # postnet in TRAIN loss path has no seq_mask; same on both sides here
    np.testing.assert_allclose(after_j, after_t, atol=2e-4)


def test_predictors_parity(setup):
    cfg, model, params, state, batch, mirror = setup
    from fcl_taco2_tpu.models import components as C
    from fcl_taco2_tpu.models.encoder import encoder_apply
    from fcl_taco2_tpu.ops.masking import lengths_to_pad_mask

    hs, _, _ = encoder_apply(params["encoder"], state["encoder"], cfg,
                             batch.tokens, batch.ilens, None, train=False)
    pad = lengths_to_pad_mask(batch.ilens, batch.tokens.shape[1])
    d_j = C.duration_predictor_apply(params["duration_predictor"], hs, pad,
                                     None, 0.0, False)
    p_j = C.variance_predictor_apply(params["pitch_predictor"], hs, pad,
                                     None, 0.0, False)
    with torch.no_grad():
        hs_t = mirror.encoder(torch.from_numpy(
            np.asarray(batch.tokens)).long(),
            torch.from_numpy(np.asarray(batch.ilens)).long())
        np.testing.assert_allclose(np.asarray(hs), hs_t.numpy(), atol=1e-4)
        pad_np = np.asarray(pad)
        d_t = mirror.variance(mirror.p["duration_predictor"], hs_t,
                              pad_np)[..., 0]
        p_t = mirror.variance(mirror.p["pitch_predictor"], hs_t, pad_np)
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_j), p_t.numpy(), atol=1e-4)


def test_ar_inference_mel_parity(setup):
    """Given fixed durations and no dropout, the full synthesize() output
    must match the torch mirror's AR decode + postnet."""
    cfg, model, params, state, batch, mirror = setup
    tokens = np.array([[1, 2, 3, 0, 0]], np.int32)
    ilens = np.array([3], np.int32)
    durs = np.array([[2, 3, 4, 0, 0]], np.int32)
    F = 16
    out = model.synthesize(params, state, jnp.asarray(tokens),
                           jnp.asarray(ilens), jax.random.PRNGKey(0),
                           frame_budget=F, durations=jnp.asarray(durs))
    mel_j = np.asarray(out["mel"])[0]
    L = int(out["olens"][0])
    assert L == 9

    with torch.no_grad():
        tok_t = torch.from_numpy(tokens).long()
        il_t = torch.from_numpy(ilens).long()
        hs = mirror.encoder(tok_t, il_t)
        pad = np.arange(5)[None] >= ilens[:, None]
        p_outs = mirror.variance(mirror.p["pitch_predictor"], hs, pad)
        e_outs = mirror.variance(mirror.p["energy_predictor"], hs, pad)
        hs = hs + mirror.scalar_embed(mirror.p["pitch_embed"], p_outs) \
            + mirror.scalar_embed(mirror.p["energy_embed"], e_outs)
        # phoneme batch: 3 segments with durations 2,3,4
        enc_seg = hs[0, :3]
        D = cfg.max_dur
        position = torch.zeros(3, D)
        for i, d in enumerate([2, 3, 4]):
            position[i, :d] = torch.arange(d) / d
        seg = mirror.decoder_ar(enc_seg, position, D).numpy()
        mel_t = np.zeros((1, F, cfg.odim), np.float32)
        pos = 0
        for i, d in enumerate([2, 3, 4]):
            mel_t[0, pos:pos + d] = seg[i, :d]
            pos += d
        seq_mask = (np.arange(F)[None] < L).astype(np.float32)
        after_t = mel_t + mirror.postnet(torch.from_numpy(mel_t),
                                         seq_mask=seq_mask).numpy()
        after_t *= seq_mask[..., None]

    np.testing.assert_allclose(mel_j, after_t[0], atol=3e-4)
