"""Loader feature-transform hook (data/transform.py).

Reference parity: --preprocess-conf builds an espnet Transformation the
feature loader applies per utterance (/root/reference/io_utils_fcl.py:
58-66) with train=True for training iterators and train=False for
validation/decode (/root/reference/tts.py:486-498).
"""

import json

import numpy as np
import pytest

from fcl_taco2_tpu.data import BatchConverter, load_manifest
from fcl_taco2_tpu.data.transform import Transformation

from test_data_pipeline import write_corpus


def test_utterance_cmvn_normalizes():
    t = Transformation({"process": [
        {"type": "utterance_cmvn", "norm_vars": True}]})
    x = np.random.default_rng(0).normal(3.0, 2.0, (40, 8)) \
        .astype(np.float32)
    y = t(x, train=False)
    np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(0), 1.0, atol=1e-4)


def test_global_cmvn_uses_stats_file(tmp_path):
    rng = np.random.default_rng(1)
    mean = rng.normal(size=8).astype(np.float32)
    std = np.abs(rng.normal(size=8)).astype(np.float32) + 0.5
    stats = tmp_path / "stats.npy"
    np.save(stats, np.stack([mean, std]))
    t = Transformation({"process": [
        {"type": "global_cmvn", "stats": str(stats)}]})
    x = rng.normal(size=(10, 8)).astype(np.float32)
    np.testing.assert_allclose(t(x), (x - mean) / std, rtol=1e-5)


def test_train_only_masking_and_mode_flag():
    t = Transformation({"process": [
        {"type": "time_mask", "T": 10, "n_mask": 2},
        {"type": "freq_mask", "F": 4, "n_mask": 2}]})
    x = np.ones((50, 8), np.float32)
    # eval mode: identity
    np.testing.assert_array_equal(t(x, train=False), x)
    # train mode: some zeros appear (T up to 10, 2 masks -> overwhelmingly
    # likely nonzero width across a few draws)
    masked = any((t(x, train=True) == 0).any() for _ in range(5))
    assert masked


def test_unknown_type_and_length_change_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown transform"):
        Transformation({"process": [{"type": "nope"}]})
    conf = tmp_path / "bad.json"
    conf.write_text("not json {{")
    with pytest.raises(Exception):
        Transformation(str(conf))


def test_converter_applies_transform_per_mode(tmp_path):
    utts = load_manifest(write_corpus(str(tmp_path)))
    conf = {"process": [{"type": "gain", "factor": 2.0}]}
    plain = BatchConverter(max_dur=6, batch_size=2, odim=8)
    hooked = BatchConverter(max_dur=6, batch_size=2, odim=8,
                            transform=Transformation(conf))
    a = plain(utts[:2])
    b = hooked(utts[:2])
    np.testing.assert_allclose(np.asarray(b.mel), 2.0 * np.asarray(a.mel),
                               rtol=1e-6)
    # durations/f0/energy untouched
    np.testing.assert_array_equal(np.asarray(a.durations),
                                  np.asarray(b.durations))


def test_converter_transform_applies_after_cache(tmp_path):
    """Stochastic train-only ops must re-draw per call even with the
    feature cache on (the cache stores RAW features)."""
    utts = load_manifest(write_corpus(str(tmp_path)))
    conv = BatchConverter(
        max_dur=6, batch_size=2, odim=8, cache={},
        transform=Transformation(
            {"process": [{"type": "time_mask", "T": 4, "n_mask": 2}]}),
        transform_train=True)
    mels = [np.asarray(conv(utts[:2]).mel) for _ in range(6)]
    assert any(not np.array_equal(mels[0], m) for m in mels[1:])
    # raw features still cached un-transformed
    conv.transform_train = False
    raw = np.asarray(conv(utts[:2]).mel)
    plain = np.asarray(
        BatchConverter(max_dur=6, batch_size=2, odim=8)(utts[:2]).mel)
    np.testing.assert_array_equal(raw, plain)


def test_cli_preprocess_conf_flag(tmp_path):
    """--preprocess-conf threads through fcl_train into the Trainer's
    converter (reference tts_train.py:190 -> tts.py:487)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from cli.fcl_train import get_parser, parse_with_configs, \
        train_config_from_args
    conf = tmp_path / "pp.json"
    conf.write_text(json.dumps(
        {"process": [{"type": "utterance_cmvn"}]}))
    args = parse_with_configs(get_parser(), [
        "--train-json", "x", "--valid-json", "y",
        "--preprocess-conf", str(conf)])
    tcfg = train_config_from_args(args)
    assert tcfg.preprocess_conf == str(conf)
