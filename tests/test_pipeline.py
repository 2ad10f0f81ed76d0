"""End-to-end TTS pipeline + chunked (streaming) vocoding."""

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.infer.pipeline import (TTSPipeline, pwg_receptive_field,
                                          vocode_chunked)
from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.vocoder.pwg import PWGConfig, pwg_generate, pwg_init

from helpers import tiny_config


def small_pwg():
    return PWGConfig(layers=4, stacks=2, residual_channels=8,
                     gate_channels=16, skip_channels=8, aux_channels=8,
                     upsample_scales=(2, 2), aux_context_window=1)


def test_pipeline_text_to_wav():
    cfg = tiny_config()  # odim=8 == pwg aux_channels
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    pwg_cfg = small_pwg()
    pwg_params = pwg_init(jax.random.PRNGKey(1), pwg_cfg)
    pipe = TTSPipeline(model, params, state, pwg_params, pwg_cfg,
                       sample_rate=22050)
    wavs, stats = pipe.tts_batch(
        [np.array([1, 2, 3], np.int32), np.array([4, 5], np.int32)],
        jax.random.PRNGKey(2))
    assert len(wavs) == 2
    assert stats["rtf_x"] > 0
    for w, frames in zip(wavs, [None, None]):
        assert w.ndim == 1
        assert np.isfinite(w).all()


def test_chunked_vocoding_matches_full():
    pwg_cfg = small_pwg()
    params = pwg_init(jax.random.PRNGKey(0), pwg_cfg)
    rng = np.random.default_rng(0)
    T = 40
    mel = rng.normal(size=(T, pwg_cfg.aux_channels)).astype(np.float32)
    noise = rng.normal(size=(T * pwg_cfg.hop,)).astype(np.float32)

    full = np.asarray(pwg_generate(params, pwg_cfg, jnp.asarray(mel[None]),
                                   jnp.asarray(noise[None])))[0]
    chunks = list(vocode_chunked(params, pwg_cfg, mel, noise,
                                 chunk_frames=8))
    stitched = np.concatenate(chunks)
    assert stitched.shape == full.shape
    np.testing.assert_allclose(stitched, full, atol=1e-4)


def test_receptive_field_positive_and_reasonable():
    cfg = PWGConfig()
    rf = pwg_receptive_field(cfg)
    assert 1000 < rf < 50000  # ~6k conv + upsample halo, in samples


def test_fcl_tts_cli(tmp_path):
    """Single-command end-to-end TTS over a manifest."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cli import fcl_tts
    from test_data_pipeline import write_corpus
    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.train.checkpoint import (save_checkpoint,
                                                save_model_json)
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState
    import numpy as np

    corpus = write_corpus(str(tmp_path), n_utts=3, odim=8)
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = build_optimizer()
    exp = os.path.join(str(tmp_path), "exp")
    save_model_json(exp, cfg)
    ckpt = os.path.join(exp, "model.loss.best")
    save_checkpoint(ckpt, TrainState(params, state, tx.init(params),
                                     np.int32(0)))
    out = os.path.join(str(tmp_path), "wavs")
    fcl_tts.main(["--model", ckpt, "--json", corpus, "--outdir", out,
                  "--batch-size", "2"])
    import wave
    files = sorted(os.listdir(out))
    assert len(files) == 3
    with wave.open(os.path.join(out, files[0])) as f:
        assert f.getframerate() == 22050
