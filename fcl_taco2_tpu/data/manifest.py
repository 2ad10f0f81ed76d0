"""Corpus manifest: espnet-style data.json, schema-compatible with the
reference's preprocess output (/root/reference/preprocess.py:199-241) so
reference-preprocessed corpora load unchanged.

Per utterance the json carries:
    input[0] mel      {'feat': <npy>, 'filetype': 'npy', 'shape': [L, odim]}
    input[1] duration {'feat': <npy>, 'shape': [T, 1]}
    input[2] f0       {'feat': <npy>, 'shape': [T, 1]}
    input[3] energy   {'feat': <npy>, 'shape': [T, 1]}
    output[0] text    {'tokenid': '1 5 2 ...', 'shape': [T, V]}

The loader below is the TTS io path of the reference's
LoadInputsAndTargets(mode='tts', use_second_target + f0/energy unpack,
io_utils_fcl.py:297-390).  Supported filetypes: 'npy', 'mat' (kaldi binary
ark pointers 'path:offset', read with our pure-python reader), and 'hdf5'
('path:key'); 'sound*' corpora should be converted with
cli/fcl_preprocess.py.  Optional 'spembs' entries (xvector manifests) are
loaded when present.
"""

import json
from typing import Dict, List, NamedTuple

import numpy as np


class Utterance(NamedTuple):
    uttid: str
    tokenids: np.ndarray      # (T,) int32
    n_tokens: int
    n_frames: int
    mel_path: str
    dur_path: str
    f0_path: str
    energy_path: str
    filetypes: tuple = ("npy", "npy", "npy", "npy")
    spemb_path: str = ""      # optional speaker-embedding pointer


def _load_feat(path, filetype):
    """Read one feature by filetype (io_utils_fcl.py:392-473 analogue)."""
    if filetype == "npy":
        return np.load(path)
    if filetype == "mat":  # kaldi binary ark pointer 'file:offset'
        from fcl_taco2_tpu.infer.ark import read_ark_matrix
        return read_ark_matrix(path)
    if filetype == "hdf5":  # 'file:key'
        import h5py
        fname, key = path.rsplit(":", 1)
        with h5py.File(fname, "r") as f:
            return f[key][()]
    raise NotImplementedError(
        f"filetype {filetype!r}: convert the corpus with "
        "cli/fcl_preprocess.py")


def load_manifest(json_path: str) -> List[Utterance]:
    with open(json_path) as f:
        js = json.load(f)["utts"]
    utts = []
    for uttid in sorted(js.keys()):
        entry = js[uttid]
        inputs = {i["name"]: i for i in entry["input"]}
        output = entry["output"][0]
        names = ("input1", "input2", "input3", "input4")
        filetypes = tuple(inputs[n].get("filetype", "npy") for n in names)
        for ft in filetypes:
            if ft not in ("npy", "mat", "hdf5"):
                raise NotImplementedError(
                    f"filetype {ft!r} for {uttid}: convert the corpus "
                    "with cli/fcl_preprocess.py")
        tokenids = np.asarray([int(t) for t in output["tokenid"].split()],
                              np.int32)
        spemb = inputs.get("spembs", {}).get("feat", "")
        utts.append(Utterance(
            uttid=uttid,
            tokenids=tokenids,
            n_tokens=len(tokenids),
            n_frames=int(inputs["input1"]["shape"][0]),
            mel_path=inputs["input1"]["feat"],
            dur_path=inputs["input2"]["feat"],
            f0_path=inputs["input3"]["feat"],
            energy_path=inputs["input4"]["feat"],
            filetypes=filetypes,
            spemb_path=spemb,
        ))
    return utts


def load_features(utt: Utterance):
    """Read one utterance's features from disk (host side, worker thread)."""
    ft = utt.filetypes
    mel = _load_feat(utt.mel_path, ft[0]).astype(np.float32)  # (L, odim)
    dur = _load_feat(utt.dur_path, ft[1]).reshape(-1).astype(np.int32)
    f0 = _load_feat(utt.f0_path, ft[2]).reshape(-1, 1).astype(np.float32)
    energy = _load_feat(utt.energy_path,
                        ft[3]).reshape(-1, 1).astype(np.float32)
    if len(dur) != utt.n_tokens:
        raise ValueError(
            f"{utt.uttid}: {len(dur)} durations vs {utt.n_tokens} tokens")
    return mel, dur, f0, energy


def load_vocab(phn2idx_path: str) -> Dict[str, int]:
    """phn2idx.json written by preprocessing (PAD=0,
    preprocess.py:277-291)."""
    with open(phn2idx_path) as f:
        raw = json.load(f)
    return {k: int(v) for k, v in raw.items()}
