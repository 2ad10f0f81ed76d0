#!/usr/bin/env python3
"""Duration-predictor quality artifact (VERDICT r03 #7).

Measures, on the held-out test shard:
1. predicted-duration accuracy for teacher and student: per-phone L1 /
   RMSE / Pearson correlation and per-utterance total-length relative
   error (the predictor drives both timing and total synthesis length);
2. the pred-dur MCD *sensitivity*: student synthesized with (a) its own
   predicted durations, (b) the TEACHER's predicted durations, (c) ground
   truth — isolating how much of the pred-vs-gt MCD gap is the duration
   predictor rather than the acoustic decoder.

Rounding semantics note: inference is round(exp(logd) - 1) clamped to
[0, max_dur] (models/components.py:211-216), bit-matching espnet
DurationPredictor.inference (offset 1) used by the reference
(e2e_tts_tacotron2_sa.py:641-646); gt durations pass the <=max_dur
preprocessing filter, so the clamp is inert on this corpus.

Writes results/DUR_quality.json.

Usage: python scripts/dur_quality.py --feat-dir /tmp/.../features \
          --teacher-exp /tmp/.../exp_teacher [--student-exp .../exp_student]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def predict_durations(model, params, state, utts, batch=16):
    """Jitted synth_frontend over padded batches -> list of per-utt
    predicted-duration vectors (int, true length)."""
    import jax
    import jax.numpy as jnp

    Tmax = max(u.n_tokens for u in utts)
    Tmax = int(np.ceil(Tmax / 8) * 8)

    @jax.jit
    def fn(tokens, ilens):
        _, d_outs, _, _ = model.synth_frontend(params, state, tokens,
                                               ilens)
        return d_outs

    from fcl_taco2_tpu.data.manifest import load_durations
    preds, gts = [], []
    for i in range(0, len(utts), batch):
        chunk = utts[i:i + batch]
        toks = np.zeros((batch, Tmax), np.int32)
        ilens = np.zeros(batch, np.int32)
        for j, u in enumerate(chunk):
            t = np.asarray(u.tokenids, np.int32)
            toks[j, :len(t)] = t
            ilens[j] = len(t)
        d = np.asarray(fn(jnp.asarray(toks), jnp.asarray(ilens)))
        for j, u in enumerate(chunk):
            preds.append(d[j, :ilens[j]].astype(np.int64))
            gts.append(np.asarray(load_durations(u), np.int64))
    return preds, gts


def duration_metrics(preds, gts):
    p = np.concatenate(preds).astype(np.float64)
    g = np.concatenate(gts).astype(np.float64)
    tot_rel = np.asarray([abs(a.sum() - b.sum()) / max(b.sum(), 1)
                          for a, b in zip(preds, gts)])
    corr = float(np.corrcoef(p, g)[0, 1]) if len(p) > 1 else float("nan")
    return {
        "n_phones": int(len(p)),
        "gt_mean_frames": round(float(g.mean()), 3),
        "pred_mean_frames": round(float(p.mean()), 3),
        "l1_frames": round(float(np.abs(p - g).mean()), 4),
        "rmse_frames": round(float(np.sqrt(((p - g) ** 2).mean())), 4),
        "pearson_r": round(corr, 4),
        "utt_total_len_rel_err_mean": round(float(tot_rel.mean()), 4),
        "utt_total_len_rel_err_p90": round(
            float(np.percentile(tot_rel, 90)), 4),
    }


def oracle_metrics(feat_dir, test_utts, gts):
    """Train-split per-token conditional-mean predictor — the best any
    model can do from token identity alone on this corpus."""
    from fcl_taco2_tpu.data import load_manifest
    from fcl_taco2_tpu.data.manifest import load_durations

    train = load_manifest(os.path.join(feat_dir, "train_data.json"))
    toks = np.concatenate([np.asarray(u.tokenids, np.int64)
                           for u in train])
    durs = np.concatenate([np.asarray(load_durations(u), np.int64)
                           for u in train])
    means = {int(t): durs[toks == t].mean() for t in np.unique(toks)}
    gmean = durs.mean()
    preds = [np.asarray([means.get(int(t), gmean) for t in u.tokenids])
             for u in test_utts]
    out = duration_metrics(preds, gts)
    out["what"] = ("train-split per-token conditional mean (learnable "
                   "floor; fractional frames, no rounding)")
    return out


def mcd_with_durations(model, params, state, utts, mel_stats, durations,
                       batch=8, seed=1):
    """Synthesize with explicit per-utterance durations (or None for the
    model's own predictor) and score MCD/L1 vs ground-truth mels."""
    import jax

    from fcl_taco2_tpu.data.manifest import _load_feat
    from fcl_taco2_tpu.infer.metrics import mel_cepstral_distortion
    from fcl_taco2_tpu.infer.synth import Synthesizer

    mean, std = mel_stats
    synth = Synthesizer(model, params, state, batch_size=batch,
                        frame_per_token=16)
    mcds, l1s = [], []
    for i in range(0, len(utts), batch):
        chunk = utts[i:i + batch]
        toks = [np.asarray(u.tokenids, np.int32) for u in chunk]
        durs = None if durations is None else [
            np.asarray(durations[i + j], np.int32)
            for j in range(len(chunk))]
        mels, _ = synth.synth_batch(toks, rng=jax.random.PRNGKey(seed + i),
                                    durations=durs)
        for u, m in zip(chunk, mels):
            gt = _load_feat(u.mel_path, u.filetypes[0]) * std + mean
            m = m * std + mean
            n = min(len(gt), len(m))
            mcds.append(mel_cepstral_distortion(m[:n], gt[:n]))
            l1s.append(float(np.abs(m[:n] - gt[:n]).mean()))
    return {"mcd": round(float(np.mean(mcds)), 3),
            "l1": round(float(np.mean(l1s)), 4), "n_utts": len(mcds)}


def load_model(exp_dir, ckpt=None):
    import jax

    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.train.checkpoint import (load_model_json,
                                                load_params_only)
    from fcl_taco2_tpu.utils.device import zeros_like_shapes

    cfg, _ = load_model_json(exp_dir)
    model = Tacotron2SA(cfg)
    tp, tstate = zeros_like_shapes(model.init, jax.random.PRNGKey(0))
    params, state = load_params_only(
        ckpt or os.path.join(exp_dir, "model.loss.best"), tp, tstate)
    # device arrays, not host numpy: predict_durations jits over these
    # as closure constants (numpy leaves break under trace — a numpy
    # embed table cannot be indexed by a traced token array)
    params, state = jax.device_put((params, state))
    return model, params, state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feat-dir", type=str, required=True)
    p.add_argument("--teacher-exp", type=str, required=True)
    p.add_argument("--student-exp", type=str, default=None)
    p.add_argument("--json", type=str, default=None,
                   help="default: <feat-dir>/test_data.json")
    p.add_argument("--out", type=str, default=os.path.join(
        REPO, "results", "DUR_quality.json"))
    args = p.parse_args(argv)

    from fcl_taco2_tpu.data import load_manifest
    from fcl_taco2_tpu.utils.device import warmup_transfers

    warmup_transfers()
    utts = load_manifest(args.json
                         or os.path.join(args.feat_dir, "test_data.json"))
    mel_stats = np.load(os.path.join(args.feat_dir, "mel_stats.npy"))

    import jax
    payload = {"protocol": {
        "what": "held-out duration accuracy (per-phone L1/RMSE/Pearson, "
                "per-utt total-length rel err) + pred-dur MCD sensitivity "
                "(student decoded with own/teacher/gt durations)",
        "n_utts": len(utts), "backend": jax.default_backend(),
        "rounding": "round(exp(logd)-1) clamp [0,max_dur] == espnet "
                    "DurationPredictor.inference offset=1",
    }}

    t_model, t_params, t_state = load_model(args.teacher_exp)
    t_preds, gts = predict_durations(t_model, t_params, t_state, utts)
    payload["teacher_durations"] = duration_metrics(t_preds, gts)
    print("teacher durations:",
          json.dumps(payload["teacher_durations"]), flush=True)

    # learnable floor: the synthetic corpus samples each phone's duration
    # as noise around a per-token mean (audio/synthcorpus.py), so the
    # best predictor given token identity is the train-split per-token
    # conditional mean — any model metric at/near this oracle is at the
    # corpus's information floor, not underfit
    payload["oracle_durations"] = oracle_metrics(args.feat_dir, utts, gts)
    print("oracle (train-split per-token mean):",
          json.dumps(payload["oracle_durations"]), flush=True)

    if args.student_exp:
        s_model, s_params, s_state = load_model(args.student_exp)
        s_preds, _ = predict_durations(s_model, s_params, s_state, utts)
        payload["student_durations"] = duration_metrics(s_preds, gts)
        print("student durations:",
              json.dumps(payload["student_durations"]), flush=True)
        sens = {}
        for tag, durs in (("own_pred", None), ("teacher_pred", t_preds),
                          ("gt", gts)):
            sens[tag] = mcd_with_durations(s_model, s_params, s_state,
                                           utts, mel_stats, durs)
            print(f"student MCD [{tag}]:", json.dumps(sens[tag]),
                  flush=True)
        payload["student_mcd_by_duration_source"] = sens

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
