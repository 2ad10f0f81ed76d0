"""Synthesizer driver behavior: jit-cache discipline and the speaking-rate
knob (d_factor), which must be a traced scalar — the reference's decode
loop has no rate knob at all, and round 1 keyed the jit cache on the float
(a fresh multi-minute compile per rate on the relay)."""

import numpy as np
import jax

from fcl_taco2_tpu.infer import Synthesizer
from fcl_taco2_tpu.models import Tacotron2SA

from helpers import tiny_config


def _make_synth():
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    return cfg, Synthesizer(model, params, state, batch_size=2,
                            tok_bucket=8, frame_bucket=64)


def test_d_factor_shares_one_compile():
    _, synth = _make_synth()
    toks = [np.array([1, 2, 3], np.int32), np.array([2, 1], np.int32)]
    durs = [np.array([2, 3, 2], np.int32), np.array([4, 1], np.int32)]
    for f in (1.0, 0.5, 1.25, 2.0):
        synth.synth_batch(toks, jax.random.PRNGKey(0), durations=durs,
                          d_factor=f)
    # all rates and both duration sources share ONE cached executable per
    # (B, Tmax, budget) bucket; here every call used the same bucket
    assert len(synth._jitted) == 1, sorted(synth._jitted)


def test_d_factor_scales_durations_exactly():
    _, synth = _make_synth()
    toks = [np.array([1, 2, 3], np.int32)]
    durs = [np.array([2, 3, 2], np.int32)]
    mels1, _ = synth.synth_batch(toks, jax.random.PRNGKey(0),
                                 durations=durs, d_factor=1.0)
    mels2, _ = synth.synth_batch(toks, jax.random.PRNGKey(0),
                                 durations=durs, d_factor=2.0)
    assert mels1[0].shape[0] == 7
    assert mels2[0].shape[0] == 14  # round(d * 2.0) per phoneme


def test_d_factor_identity_at_one():
    """round(int32 * 1.0) must be the exact identity (no off-by-one from
    the always-applied traced multiply)."""
    _, synth = _make_synth()
    toks = [np.array([1, 2, 3, 4], np.int32)]
    durs = [np.array([1, 5, 6, 3], np.int32)]  # within max_dur=6
    mels, _ = synth.synth_batch(toks, jax.random.PRNGKey(0),
                                durations=durs, d_factor=1.0)
    assert mels[0].shape[0] == 15


def test_redispatch_instead_of_truncation():
    """Pathological duration prediction (VERDICT r2 weak #4): when predicted
    durations exceed the heuristic frame budget, synth_batch must re-run at
    the exact bucket and return FULL mels, never truncated ones."""
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    # bias the duration predictor's output linear so every token predicts
    # ~round(exp(3)-1)=19 -> clipped to max_dur=6 frames: 8 tokens * 6 =
    # 48 frames >> the frame_per_token=1 budget of 8
    params["duration_predictor"]["linear"]["b"] = \
        params["duration_predictor"]["linear"]["b"] + 3.0
    synth = Synthesizer(model, params, state, batch_size=2, tok_bucket=8,
                        frame_per_token=1, frame_bucket=8)
    toks = [np.arange(1, 9, dtype=np.int32), np.arange(1, 5, dtype=np.int32)]
    mels, stats = synth.synth_batch(toks, jax.random.PRNGKey(0))
    assert stats["redispatched"] == 1, stats
    assert stats["truncated"] == 0
    # full predicted length came back: durations clip to max_dur per token
    assert mels[0].shape[0] == 8 * cfg.max_dur, mels[0].shape
    assert mels[1].shape[0] == 4 * cfg.max_dur, mels[1].shape
    # and re-dispatch happened at the exact bucket
    assert max(k[2] for k in synth._jitted) == 48
