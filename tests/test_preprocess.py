"""Preprocessing pipeline: TextGrid parse, alignment merge rules, full
corpus run -> manifests that feed straight into training."""

import json
import os

import numpy as np

from fcl_taco2_tpu.audio.preprocess import (PreprocessConfig,
                                            alignment_from_textgrid,
                                            run_preprocess)
from fcl_taco2_tpu.audio.textgrid import get_tier, read_textgrid


def write_textgrid(path, intervals, tier_name="phones"):
    """Write a Praat long-format TextGrid."""
    xmax = intervals[-1][1]
    lines = [
        'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
        "xmin = 0", f"xmax = {xmax}", "tiers? <exists>", "size = 1",
        "item []:", "    item [1]:", '        class = "IntervalTier"',
        f'        name = "{tier_name}"', "        xmin = 0",
        f"        xmax = {xmax}",
        f"        intervals: size = {len(intervals)}",
    ]
    for i, (a, b, t) in enumerate(intervals, 1):
        lines += [f"        intervals [{i}]:", f"            xmin = {a}",
                  f"            xmax = {b}", f'            text = "{t}"']
    with open(path, "w") as f:
        f.write("\n".join(lines))


def make_corpus(root, n_utts=6, sr=22050, seed=0):
    """Synthetic corpus: tone-burst wavs + aligned TextGrids."""
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)
    os.makedirs(os.path.join(root, "tg"), exist_ok=True)
    phones = ["AA", "IY", "K", "T", "sil"]
    for i in range(n_utts):
        uttid = f"utt{i:03d}"
        n_ph = int(rng.integers(3, 6))
        segs = []
        t = 0.0
        for j in range(n_ph):
            d = float(rng.uniform(0.05, 0.25))
            segs.append((round(t, 4), round(t + d, 4),
                         phones[int(rng.integers(0, len(phones)))]))
            t += d
        total = int(segs[-1][1] * sr)
        tt = np.arange(total) / sr
        x = 0.4 * np.sin(2 * np.pi * rng.uniform(100, 300) * tt)
        x += 0.05 * rng.normal(size=total)
        wavfile.write(os.path.join(root, "wavs", f"{uttid}.wav"), sr,
                      (x * 32767).astype(np.int16))
        write_textgrid(os.path.join(root, "tg", f"{uttid}.TextGrid"), segs)
    return root


def test_textgrid_roundtrip(tmp_path):
    p = os.path.join(str(tmp_path), "a.TextGrid")
    write_textgrid(p, [(0.0, 0.5, "AA"), (0.5, 0.8, ""), (0.8, 1.0, "sp")])
    tier = get_tier(read_textgrid(p), "phones")
    assert [iv.text for iv in tier.intervals] == ["AA", "", "sp"]
    assert tier.intervals[1].xmin == 0.5


def test_alignment_trailing_silence_merge(tmp_path):
    """preprocess.py:177-183: trailing ''/sp/spn becomes sil; two trailing
    silences merge into one."""
    p = os.path.join(str(tmp_path), "m.TextGrid")
    write_textgrid(p, [(0.0, 0.5, "AA"), (0.5, 0.8, "sp"), (0.8, 1.0, "")])
    phones, durs = alignment_from_textgrid(p, 22050, 256)
    assert phones == ["AA", "sil"]
    assert durs[1] == int(1.0 * 22050) // 256 - int(0.5 * 22050) // 256


def test_full_preprocess_to_training(tmp_path):
    root = make_corpus(str(tmp_path))
    feat = os.path.join(str(tmp_path), "features")
    cfg = PreprocessConfig(
        data_root=root, feature_root=feat,
        textgrid_root=os.path.join(root, "tg"), n_val=1, n_test=1,
        max_dur=50, batch_frames=2 ** 18)
    splits, stats = run_preprocess(cfg, log=lambda *a: None)
    assert len(splits["train"]) == 4

    # stats: normalized train mels ~ zero mean unit var per dim
    with open(os.path.join(feat, "phn2idx.json")) as f:
        phn2idx = json.load(f)
    assert phn2idx["PAD"] == 0
    mels = [np.load(os.path.join(feat, "mels", f"{u}.npy"))
            for u in splits["train"]]
    allm = np.concatenate(mels, 0)
    np.testing.assert_allclose(allm.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(allm.std(0), 1.0, atol=1e-2)

    # f0 zeros preserved through normalization
    f0s = np.concatenate([np.load(os.path.join(feat, "f0", f"{u}.npy"))
                          for u in splits["train"]])
    assert np.isfinite(f0s).all()

    # pre-fix-up duration artifacts (preprocess.py:191-194): same token
    # count as the fixed-up files; totals differ only in the LAST token
    for u in splits["train"]:
        ori = np.load(os.path.join(feat, "durations_MFA-ori", f"{u}.npy"))
        fix = np.load(os.path.join(feat, "durations_MFA", f"{u}.npy"))
        assert ori.shape == fix.shape
        np.testing.assert_array_equal(ori[:-1], fix[:-1])

    # manifests load and a train step runs
    from fcl_taco2_tpu.data import load_manifest
    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.parallel.mesh import make_mesh
    from fcl_taco2_tpu.train.loop import TrainConfig, Trainer

    utts = load_manifest(os.path.join(feat, "train_data.json"))
    assert len(utts) == 4
    from helpers import tiny_config
    mcfg = tiny_config(idim=len(phn2idx), odim=80, max_dur=50)
    model = Tacotron2SA(mcfg)
    tcfg = TrainConfig(exp_dir=os.path.join(str(tmp_path), "exp"), epochs=1,
                       batch_size=4)
    trainer = Trainer(model, tcfg, utts, load_manifest(
        os.path.join(feat, "val_data.json")), mesh=make_mesh(1))
    trainer.run()
    with open(os.path.join(str(tmp_path), "exp", "log.jsonl")) as f:
        entry = json.loads(f.readline())
    assert np.isfinite(entry["main/loss"])
