"""Manifest/batchfy/converter tests on a synthetic on-disk corpus."""

import json
import os

import numpy as np
import pytest

from fcl_taco2_tpu.data import BatchConverter, load_manifest, make_batchset


def write_corpus(tmpdir, n_utts=6, odim=8, max_dur=6, seed=0, vocab=11,
                 spk_embed_dim=0):
    rng = np.random.default_rng(seed)
    feat = os.path.join(tmpdir, "feats")
    os.makedirs(feat, exist_ok=True)
    js = {}
    for i in range(n_utts):
        uttid = f"utt{i:03d}"
        T = int(rng.integers(2, 7))
        dur = rng.integers(0, max_dur + 1, T).astype(np.int64)
        if dur.sum() == 0:
            dur[0] = 1
        L = int(dur.sum())
        mel = rng.normal(size=(L, odim)).astype(np.float32)
        f0 = rng.normal(size=(T, 1)).astype(np.float32)
        en = rng.normal(size=(T, 1)).astype(np.float32)
        tokens = rng.integers(1, vocab, T)
        paths = {}
        arrays = [("mel", mel), ("dur", dur.reshape(-1, 1)), ("f0", f0),
                  ("en", en)]
        if spk_embed_dim:
            arrays.append(
                ("spemb",
                 rng.normal(size=(spk_embed_dim,)).astype(np.float32)))
        for name, arr in arrays:
            p = os.path.join(feat, f"{uttid}_{name}.npy")
            np.save(p, arr)
            paths[name] = p
        inputs = [
            {"feat": paths["mel"], "filetype": "npy", "name": "input1",
             "shape": [L, odim]},
            {"feat": paths["dur"], "filetype": "npy", "name": "input2",
             "shape": [T, 1]},
            {"feat": paths["f0"], "filetype": "npy", "name": "input3",
             "shape": [T, 1]},
            {"feat": paths["en"], "filetype": "npy", "name": "input4",
             "shape": [T, 1]},
        ]
        if spk_embed_dim:
            inputs.append({"feat": paths["spemb"], "filetype": "npy",
                           "name": "spembs", "shape": [spk_embed_dim]})
        js[uttid] = {
            "input": inputs,
            "output": [{"name": "target1", "shape": [T, vocab],
                        "tokenid": " ".join(str(t) for t in tokens)}],
            "utt2spk": f"spk{i % 2}" if spk_embed_dim else "LJ",
        }
    path = os.path.join(tmpdir, "data.json")
    with open(path, "w") as f:
        json.dump({"utts": js}, f)
    return path


def test_manifest_roundtrip(tmp_path):
    path = write_corpus(str(tmp_path))
    utts = load_manifest(path)
    assert len(utts) == 6
    u = utts[0]
    assert u.n_tokens == len(u.tokenids)


def test_batchfy_strategies_cover_all_utts(tmp_path):
    utts = load_manifest(write_corpus(str(tmp_path), n_utts=10))
    for kwargs in [dict(sort_key="shuffle", batch_size=3),
                   dict(sort_key="input", batch_size=3),
                   dict(sort_key="input", count="bin", batch_bins=3000),
                   dict(sort_key="input", count="frame",
                        batch_frames_out=40)]:
        batches = make_batchset(utts, **kwargs)
        seen = [u.uttid for b in batches for u in b]
        assert sorted(seen) == sorted(u.uttid for u in utts), kwargs


def test_converter_buckets_and_masks(tmp_path):
    utts = load_manifest(write_corpus(str(tmp_path)))
    conv = BatchConverter(max_dur=6, batch_size=4, odim=8, tok_bucket=4,
                          frame_bucket=8, seg_bucket=8)
    batch = conv(utts[:3])  # 3 utts padded to B=4
    B, Tmax = batch.tokens.shape
    assert B == 4 and Tmax % 4 == 0
    assert batch.mel.shape[1] % 8 == 0
    assert batch.frame_mask.shape[0] % 8 == 0
    # padded utterance must be fully masked
    assert batch.ilens[3] == 0 and batch.olens[3] == 0
    assert not batch.utt_mask[3].any()
    # mel content preserved where valid
    assert np.isfinite(batch.mel).all()


def test_converter_rejects_inconsistent_durations(tmp_path):
    path = write_corpus(str(tmp_path))
    utts = load_manifest(path)
    # corrupt one duration file
    np.save(utts[0].dur_path,
            np.load(utts[0].dur_path) + 1)
    conv = BatchConverter(max_dur=10, batch_size=2, odim=8)
    with pytest.raises(ValueError, match="durations sum"):
        conv(utts[:2])
