"""Device-resident dataset cache (data/device_cache.py): the on-device
assembled Batch must be BIT-identical to BatchConverter.__call__ on the
same utterances, and a Trainer run with the cache must reproduce the
host-streaming run's losses and final params."""

import json
import os

import numpy as np
import jax

from fcl_taco2_tpu.data import BatchConverter, load_manifest
from fcl_taco2_tpu.data.device_cache import DeviceBatchCache
from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.parallel.mesh import make_mesh
from fcl_taco2_tpu.train.loop import TrainConfig, Trainer

from helpers import tiny_config
from test_data_pipeline import write_corpus


def _assert_batches_equal(got, want):
    """Every leaf bit-equal (position included: float32 single-rounded
    d/dur == numpy's float64-then-float32 over the d,dur<=64 domain)."""
    ga = got._asdict()
    wa = want._asdict()
    for k in wa:
        g, w = ga[k], wa[k]
        if k == "seg_classes":
            if w is None:
                assert g is None
                continue
            assert len(g) == len(w)
            for gc, wc in zip(g, w):
                for f in wc._fields:
                    np.testing.assert_array_equal(
                        np.asarray(getattr(gc, f)),
                        np.asarray(getattr(wc, f)), err_msg=f"class {f}")
            continue
        if w is None:
            assert g is None, k
            continue
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=k)
        assert np.asarray(g).dtype == np.asarray(w).dtype, k


def _parity_case(tmp_path, duration_classes=(), spk_embed_dim=0):
    utts = load_manifest(write_corpus(str(tmp_path), n_utts=7,
                                      spk_embed_dim=spk_embed_dim))
    conv = BatchConverter(max_dur=6, batch_size=4, odim=8, tok_bucket=4,
                          frame_bucket=8, seg_bucket=8, cache={},
                          duration_classes=duration_classes)
    conv.fit_corpus(utts)
    dc = DeviceBatchCache(conv, utts, device=jax.devices()[0])
    # a full batch and a short (padded) batch
    for chunk in (utts[:4], utts[4:]):
        got = dc.assemble(dc.plan(chunk))
        want = conv(chunk)
        _assert_batches_equal(got, want)


def test_bit_parity_flat(tmp_path):
    _parity_case(tmp_path)


def test_bit_parity_classed(tmp_path):
    _parity_case(tmp_path, duration_classes=(2, 4, 6))


def test_bit_parity_spembs(tmp_path):
    _parity_case(tmp_path, spk_embed_dim=5)


def test_trainer_device_cache_matches_streaming(tmp_path):
    """device_cache=on vs off: identical batches feed identical steps, so
    per-epoch losses and final params must match to float tolerance."""
    corpus = write_corpus(str(tmp_path), n_utts=8)
    utts = load_manifest(corpus)
    cfg = tiny_config(dropout_rate=0.0, zoneout_rate=0.0)
    finals, logs, trainers = [], [], []
    for mode in ("off", "on"):
        model = Tacotron2SA(cfg)
        exp = os.path.join(str(tmp_path), f"exp_{mode}")
        tcfg = TrainConfig(exp_dir=exp, epochs=2, batch_size=4, seed=3,
                           device_cache=mode)
        trainer = Trainer(model, tcfg, utts[:6], utts[6:],
                          mesh=make_mesh(1))
        trainers.append(trainer)
        finals.append(trainer.run())
        with open(os.path.join(exp, "log.jsonl")) as f:
            logs.append([json.loads(l) for l in f])
    assert trainers[0]._dcache is None
    assert trainers[1]._dcache is not None
    for e1, e2 in zip(*logs):
        np.testing.assert_allclose(e1["main/loss"], e2["main/loss"],
                                   rtol=1e-6)
        np.testing.assert_allclose(e1["validation/main/loss"],
                                   e2["validation/main/loss"], rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(finals[0].params),
                    jax.tree_util.tree_leaves(finals[1].params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_chained_device_cache_matches_streaming(tmp_path):
    """device_cache=on + steps_per_dispatch=2 (the chained step scans
    assemble+step over stacked (K, P) plan packs) must reproduce the
    host-streaming step-at-a-time run: same per-epoch losses, same
    final params (identical per-step key slices feed identical
    batches)."""
    corpus = write_corpus(str(tmp_path), n_utts=8)
    utts = load_manifest(corpus)
    cfg = tiny_config(dropout_rate=0.0, zoneout_rate=0.0)
    finals, logs = [], []
    for mode, k, tag in (("off", 1, "stream"), ("on", 2, "chaincache")):
        model = Tacotron2SA(cfg)
        exp = os.path.join(str(tmp_path), f"exp_{tag}")
        tcfg = TrainConfig(exp_dir=exp, epochs=2, batch_size=4, seed=3,
                           steps_per_dispatch=k, device_cache=mode)
        trainer = Trainer(model, tcfg, utts[:6], utts[6:],
                          mesh=make_mesh(1))
        if mode == "on":
            assert trainer._dcache is not None
        finals.append(trainer.run())
        with open(os.path.join(exp, "log.jsonl")) as f:
            logs.append([json.loads(l) for l in f])
    for e1, e2 in zip(*logs):
        np.testing.assert_allclose(e1["main/loss"], e2["main/loss"],
                                   rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(finals[0].params),
                    jax.tree_util.tree_leaves(finals[1].params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_auto_gate_falls_back(tmp_path):
    """auto: multi-device meshes stream from host; on: unsupported
    configurations raise instead of silently streaming."""
    import pytest

    utts = load_manifest(write_corpus(str(tmp_path), n_utts=8))
    model = Tacotron2SA(tiny_config())
    exp = os.path.join(str(tmp_path), "exp")
    t = Trainer(model, TrainConfig(exp_dir=exp, epochs=1, batch_size=4),
                utts[:6], utts[6:], mesh=make_mesh(4))
    assert t._dcache is None  # auto: multi-device -> host streaming
    with pytest.raises(ValueError, match="multi-device"):
        Trainer(model,
                TrainConfig(exp_dir=exp, epochs=1, batch_size=4,
                            device_cache="on"),
                utts[:6], utts[6:], mesh=make_mesh(4))
    # budget gate: a tiny cap forces streaming under auto
    t3 = Trainer(model,
                 TrainConfig(exp_dir=exp, epochs=1, batch_size=4,
                             device_cache_max_mb=0),
                 utts[:6], utts[6:], mesh=make_mesh(1))
    assert t3._dcache is None
