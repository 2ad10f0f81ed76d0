"""CLI end-to-end: preprocess -> teacher train -> KD student -> synth.

This is the reference's full workflow (teacher_model_training.sh,
student_model_training.sh, inference_*.sh) in miniature.
"""

import json
import os
import sys

import numpy as np

from test_preprocess import make_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tiny_model_flags():
    return [
        "--embed-dim", "16", "--eunits", "16", "--econv-layers", "2",
        "--econv-chans", "16", "--dunits", "20", "--prenet-units", "12",
        "--postnet-layers", "3", "--postnet-chans", "10",
        "--duration-predictor-chans", "14", "--epochs", "1",
        "--batch-size", "4", "--compute-dtype", "float32",
        "--n-devices", "1",
    ]


def test_cli_full_workflow(tmp_path):
    root = make_corpus(str(tmp_path), n_utts=8)
    feat = os.path.join(str(tmp_path), "features")

    from cli import fcl_preprocess, fcl_splitjson, fcl_synth, fcl_train

    # 1. preprocess
    fcl_preprocess.main([
        "--data-root", root, "--feature-root", feat,
        "--textgrid-root", os.path.join(root, "tg"),
        "--n-val", "2", "--n-test", "2"])
    assert os.path.exists(os.path.join(feat, "train_data.json"))

    # 2. teacher training (tiny dims via flags; yaml chain exercised)
    teacher_exp = os.path.join(str(tmp_path), "exp_teacher")
    fcl_train.main([
        "--train-json", os.path.join(feat, "train_data.json"),
        "--valid-json", os.path.join(feat, "val_data.json"),
        "--outdir", teacher_exp, "--perform-KD", "False",
        *_tiny_model_flags()])
    ckpt = os.path.join(teacher_exp, "model.loss.best")
    assert os.path.exists(ckpt)

    # 3. KD student training against the teacher checkpoint
    # teacher config yaml so the KD driver can rebuild the teacher
    tconf = os.path.join(str(tmp_path), "teacher.yaml")
    with open(tconf, "w") as f:
        f.write("embed-dim: 16\neunits: 16\neconv-layers: 2\n"
                "econv-chans: 16\ndunits: 20\nprenet-units: 12\n"
                "postnet-layers: 3\npostnet-chans: 10\n"
                "duration-predictor-chans: 14\ncompute-dtype: float32\n")
    student_exp = os.path.join(str(tmp_path), "exp_student")
    fcl_train.main([
        "--train-json", os.path.join(feat, "train_data.json"),
        "--valid-json", os.path.join(feat, "val_data.json"),
        "--outdir", student_exp, "--perform-KD", "True",
        "--teacher-config", tconf, "--teacher-checkpoint", ckpt,
        "--embed-dim", "8", "--eunits", "8", "--econv-layers", "2",
        "--econv-chans", "8", "--dunits", "12", "--prenet-units", "6",
        "--postnet-layers", "3", "--postnet-chans", "6",
        "--duration-predictor-chans", "14", "--epochs", "1",
        "--batch-size", "4", "--compute-dtype", "float32",
        "--n-devices", "1"])
    assert os.path.exists(os.path.join(student_exp, "model.loss.best"))
    with open(os.path.join(student_exp, "log.jsonl")) as f:
        entry = json.loads(f.readline())
    for k in ["main/encoder_loss", "main/decoder_loss", "main/prosody_loss",
              "main/output_l1_loss"]:
        assert k in entry, k

    # 4. shard + decode the test split with the teacher
    fcl_splitjson.main([os.path.join(feat, "test_data.json"),
                        "--parts", "2"])
    shard = os.path.join(feat, "split2utt", "test_data.1.json")
    out = os.path.join(str(tmp_path), "decode_out")
    fcl_synth.main(["--model", ckpt, "--json", shard, "--out", out,
                    "--batch-size", "2"])
    assert os.path.exists(os.path.join(out, "feats.scp"))
    assert os.path.exists(os.path.join(out, "decode.txt"))
    with open(os.path.join(out, "decode.txt")) as f:
        txt = f.read()
    # one per-utterance speed line (tts.py:665-674 parity) + summary stats
    assert txt.count("frames_per_sec") >= 1 + 3, txt
    assert "mean_frames_per_sec" in txt
    assert "p50_frames_per_sec" in txt and "p95_frames_per_sec" in txt

    # 5. ark file is readable and matches the scp index
    from fcl_taco2_tpu.infer.ark import read_ark_matrix
    with open(os.path.join(out, "feats.scp")) as f:
        lines = [l.split() for l in f.read().splitlines()]
    assert len(lines) == 1
    mat = read_ark_matrix(lines[0][1])
    assert mat.ndim == 2 and mat.shape[1] == 80


def test_cli_multispeaker_training(tmp_path):
    """Multi-speaker training is reachable from the CLI: spembs flow
    manifest -> converter -> Batch -> model (round-1 gap)."""
    from test_data_pipeline import write_corpus

    from cli import fcl_train

    corpus = write_corpus(str(tmp_path), n_utts=6, spk_embed_dim=16)
    exp = os.path.join(str(tmp_path), "exp_spk")
    fcl_train.main([
        "--train-json", corpus, "--valid-json", corpus,
        "--outdir", exp, "--perform-KD", "False",
        "--spk-embed-dim", "16",
        *_tiny_model_flags()])
    assert os.path.exists(os.path.join(exp, "model.loss.best"))
    with open(os.path.join(exp, "model.json")) as f:
        conf = json.load(f)
    assert conf["model_config"]["spk_embed_dim"] == 16


def test_remat_default_resolution():
    """--remat-decoder default is None -> on for KD, off for plain
    training (basis: results/KD_envelope.json — remat >= parity at
    every KD batch size); an explicit flag always wins."""
    from cli.fcl_train import get_parser, model_config_from_args
    from fcl_taco2_tpu.utils.cliconf import parse_with_configs

    base = ["--train-json", "x.json", "--valid-json", "y.json",
            "--outdir", "z"]
    args = parse_with_configs(get_parser(), base)
    assert args.remat_decoder is None
    args.remat_decoder = bool(args.perform_kd)  # main()'s resolution
    assert args.remat_decoder is False
    cfg = model_config_from_args(args, idim=10, odim=8)
    assert cfg.remat_decoder is False

    kd = parse_with_configs(get_parser(), base + ["--perform-KD", "True"])
    assert kd.remat_decoder is None and kd.perform_kd
    kd.remat_decoder = bool(kd.perform_kd)
    assert model_config_from_args(kd, idim=10, odim=8).remat_decoder is True

    forced = parse_with_configs(
        get_parser(), base + ["--perform-KD", "True",
                              "--remat-decoder", "False"])
    assert forced.remat_decoder is False
