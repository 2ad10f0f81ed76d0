"""F0 tracker torture goldens: voicing F1, cents error, octave-error rate
against committed fixtures with ANALYTIC ground truth.

pyworld (reference dio+stonemask, preprocess.py:64-66) is not installable
here, so ground truth is exact-by-construction: every fixture signal is
synthesized from a known f0 contour (scripts/make_f0_goldens.py).  The
cases are the classic real-speech failure modes — vibrato, a dominant
2nd harmonic (octave trap), creaky low f0 with jitter/shimmer, 5 dB-SNR
noise, breathy aspiration, formant vowels with silences, and onset
boundaries.  Budgets mirror the measured table in ops/f0.py's docstring
with margin.
"""

import os

import numpy as np

from fcl_taco2_tpu.ops.f0 import yin_f0

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "f0_goldens.npz")

# (min voicing F1, max median cents, max octave-error rate)
BUDGETS = {
    "vibrato": (0.97, 15.0, 0.01),
    "octave_trap": (0.97, 10.0, 0.01),
    "creaky_low": (0.97, 15.0, 0.01),
    "noisy": (0.95, 15.0, 0.01),
    "breathy": (0.95, 15.0, 0.01),
    "speechlike": (0.95, 15.0, 0.01),
    "onsets": (0.88, 10.0, 0.01),  # window straddles voicing boundaries
}


def _metrics(est, truth):
    T = min(len(est), len(truth))
    est, truth = est[:T], truth[:T]
    tv, ev = truth > 0, est > 0
    tp = int((tv & ev).sum())
    fp = int((~tv & ev).sum())
    fn = int((tv & ~ev).sum())
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    both = tv & ev
    assert both.sum() > 10, "degenerate case: almost no matched frames"
    cents = 1200.0 * np.abs(np.log2(est[both] / truth[both]))
    return f1, float(np.median(cents)), float((cents > 600).mean())


def test_f0_torture_goldens():
    z = np.load(FIXTURE)
    names = sorted({k.rsplit("_", 1)[0] for k in z.files
                    if k.endswith("_signal")})
    assert set(names) == set(BUDGETS), names
    failures = []
    for name in names:
        x = z[f"{name}_signal"].astype(np.float32) / 32767.0
        truth = z[f"{name}_f0"]
        est = np.asarray(yin_f0(x))
        f1, med_cents, octave = _metrics(est, truth)
        min_f1, max_cents, max_oct = BUDGETS[name]
        if f1 < min_f1 or med_cents > max_cents or octave > max_oct:
            failures.append(
                f"{name}: F1={f1:.3f} (>= {min_f1}), "
                f"median_cents={med_cents:.1f} (<= {max_cents}), "
                f"octave={octave:.3f} (<= {max_oct})")
    assert not failures, "\n".join(failures)


def test_goldens_regenerable():
    """The committed fixture matches its generator (guards against stale
    goldens after generator edits)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_f0_goldens",
        os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "make_f0_goldens.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cases = mod.make_cases()
    z = np.load(FIXTURE)
    for name, (x, truth) in cases.items():
        np.testing.assert_array_equal(
            z[f"{name}_signal"], (x * 32767).astype(np.int16), err_msg=name)
        np.testing.assert_allclose(z[f"{name}_f0"], truth, err_msg=name)


def test_synthcorpus_ground_truth():
    """YIN end-to-end on speech-like synthcorpus signals vs the
    generator's OWN excitation F0 + voicing mask (VERDICT r03 #6); the
    full 24-utt budget lives in results/F0_groundtruth.json
    (scripts/f0_groundtruth_eval.py), this gate re-scores 3 utterances."""
    from fcl_taco2_tpu.audio.synthcorpus import SR, synth_utterance
    from fcl_taco2_tpu.ops.f0 import yin_f0

    rng = np.random.default_rng(7)
    hop = 256
    tp = pred_v = true_v = 0
    cents_all = []
    for _ in range(3):
        wav, _, f0_true, vmask = synth_utterance(rng, 16, return_truth=True)
        est = np.asarray(yin_f0(np.asarray(wav, np.float32), SR, hop))
        centers = np.minimum(np.arange(len(est)) * hop, len(f0_true) - 1)
        tf0 = f0_true[centers]
        tv = np.asarray([vmask[max(c - hop // 2, 0):c + hop // 2].mean()
                         > 0.5 for c in centers])
        pv = est > 0
        tp += int((tv & pv).sum())
        pred_v += int(pv.sum())
        true_v += int(tv.sum())
        m = tv & pv
        cents_all.append(1200.0 * np.log2(est[m] / tf0[m]))
    prec, rec = tp / pred_v, tp / true_v
    f1 = 2 * prec * rec / (prec + rec)
    cents = np.abs(np.concatenate(cents_all))
    assert f1 >= 0.93, f1
    assert np.median(cents) <= 15.0, float(np.median(cents))
    assert (cents > 200).mean() <= 0.005, float((cents > 200).mean())
