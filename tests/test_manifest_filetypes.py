"""Manifest loading from kaldi-ark ('mat') and hdf5 filetypes
(io_utils_fcl.py:392-473 parity)."""

import json
import os

import numpy as np

from fcl_taco2_tpu.data.manifest import load_features, load_manifest
from fcl_taco2_tpu.infer.ark import ArkScpWriter


def test_mat_and_hdf5_filetypes(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    mel = rng.normal(size=(12, 8)).astype(np.float32)
    dur = np.array([[3.0], [4.0], [5.0]])
    f0 = rng.normal(size=(3, 1)).astype(np.float32)
    en = rng.normal(size=(3, 1)).astype(np.float32)

    ark = os.path.join(str(tmp_path), "mel.ark")
    scp = os.path.join(str(tmp_path), "mel.scp")
    with ArkScpWriter(ark, scp) as w:
        w.write("utt1", mel)
    with open(scp) as f:
        mel_ptr = f.read().split()[1]

    h5 = os.path.join(str(tmp_path), "feats.h5")
    with h5py.File(h5, "w") as f:
        f["utt1_f0"] = f0
    dur_npy = os.path.join(str(tmp_path), "dur.npy")
    en_npy = os.path.join(str(tmp_path), "en.npy")
    np.save(dur_npy, dur)
    np.save(en_npy, en)

    js = {"utts": {"utt1": {
        "input": [
            {"feat": mel_ptr, "filetype": "mat", "name": "input1",
             "shape": [12, 8]},
            {"feat": dur_npy, "filetype": "npy", "name": "input2",
             "shape": [3, 1]},
            {"feat": f"{h5}:utt1_f0", "filetype": "hdf5", "name": "input3",
             "shape": [3, 1]},
            {"feat": en_npy, "filetype": "npy", "name": "input4",
             "shape": [3, 1]},
        ],
        "output": [{"name": "target1", "shape": [3, 10],
                    "tokenid": "1 2 3"}],
        "utt2spk": "LJ"}}}
    path = os.path.join(str(tmp_path), "data.json")
    with open(path, "w") as f:
        json.dump(js, f)

    utts = load_manifest(path)
    m, d, p, e = load_features(utts[0])
    np.testing.assert_allclose(m, mel, atol=1e-6)
    np.testing.assert_array_equal(d, [3, 4, 5])
    np.testing.assert_allclose(p, f0)
    np.testing.assert_allclose(e, en)
