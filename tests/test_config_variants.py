"""Every ModelConfig knob is honored (or loudly rejected), never silently
ignored.

Sweeps the non-default configurations the reference supports — stacked /
zero-layer encoder BiLSTM (encoder_sa.py:96-99), variable decoder depth
(decoder_sa.py:360), reduction_factor>1 (decoder_sa.py:398, 488-517),
use_batch_norm=False (encoder_sa.py:63-93, decoder_sa.py:203-263),
use_masking=False (e2e_tts_tacotron2_sa.py:26-82), prenet/postnet-less
decoders (decoder_sa.py:358, 393) — through loss_fn (with gradients) and
synthesize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcl_taco2_tpu.models import ModelConfig, Tacotron2SA
from fcl_taco2_tpu.models.kd import KDStudent

from helpers import synthetic_batch, tiny_config

VARIANTS = {
    "elayers0": dict(elayers=0),
    "elayers2": dict(elayers=2),
    "econv0": dict(econv_layers=0),
    "dlayers1": dict(dlayers=1),
    "dlayers3": dict(dlayers=3),
    "r2": dict(reduction_factor=2),
    "no_bn": dict(use_batch_norm=False),
    "no_masking": dict(use_masking=False),
    "no_prenet": dict(prenet_layers=0),
    "no_postnet": dict(postnet_layers=0),
    "no_concate": dict(use_concate=False),
    "no_fe": dict(use_fe_condition=False),
    "no_position": dict(append_position=False),
    "residual": dict(use_residual=True),
    "scan_unroll4": dict(decoder_scan_unroll=4),
}


def _loss_and_grads(cfg, batch):
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    def lf(p):
        loss, (report, new_state, _) = model.loss_fn(
            p, state, batch, jax.random.PRNGKey(1), train=True)
        return loss, report

    (loss, report), grads = jax.value_and_grad(lf, has_aux=True)(params)
    return model, params, state, float(loss), report, grads


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_trains_and_synthesizes(name):
    cfg = tiny_config(**VARIANTS[name])
    batch = synthetic_batch(cfg)
    model, params, state, loss, report, grads = _loss_and_grads(cfg, batch)
    assert np.isfinite(loss), f"{name}: non-finite loss"

    # every parameter leaf receives gradient signal somewhere
    leaves, _ = jax.tree_util.tree_flatten(grads)
    g_norms = [float(jnp.abs(g).max()) for g in leaves]
    assert all(np.isfinite(g_norms)), f"{name}: non-finite grads"
    assert any(g > 0 for g in g_norms), f"{name}: all-zero grads"

    out = jax.jit(lambda p, s, t, il, k: model.synthesize(
        p, s, t, il, k, frame_budget=32))(
        params, state, batch.tokens, batch.ilens, jax.random.PRNGKey(2))
    mel = np.asarray(out["mel"])
    assert mel.shape == (batch.tokens.shape[0], 32, cfg.odim)
    assert np.isfinite(mel).all(), f"{name}: non-finite synthesis"


def test_elayers0_output_width_is_conv_chans():
    cfg = tiny_config(elayers=0)
    assert cfg.enc_odim == cfg.econv_chans
    assert cfg.dec_idim == cfg.econv_chans


def test_no_bn_removes_bn_from_pytree():
    cfg = tiny_config(use_batch_norm=False)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    assert params["encoder"]["convs"]["bns"] == []
    assert params["decoder"]["postnet"]["bns"] == []
    assert state["encoder"]["convs"]["bns"] == []
    assert state["decoder"]["postnet"]["bns"] == []


def test_use_masking_changes_loss_value():
    cfg_m = tiny_config(use_masking=True)
    cfg_u = tiny_config(use_masking=False)
    # padded Lmax so masking matters
    batch = synthetic_batch(cfg_m, Lmax=20)
    *_, loss_m, _, _ = _loss_and_grads(cfg_m, batch)
    *_, loss_u, _, _ = _loss_and_grads(cfg_u, batch)
    assert loss_m != pytest.approx(loss_u), \
        "use_masking=False must change the loss on a padded batch"


def test_r2_teacher_forced_matches_manual_unfold():
    """With reduction_factor=2 the decoder runs D/2 steps emitting 2 frames
    each; total frames regroup to the same utterance timeline as r=1."""
    cfg = tiny_config(reduction_factor=2)
    batch = synthetic_batch(cfg)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    loss, (report, _, _) = model.loss_fn(params, state, batch,
                                         jax.random.PRNGKey(1), train=False)
    assert np.isfinite(float(loss))
    # feat_out emits odim * r
    assert params["decoder"]["feat_out"]["w"].shape[-1] == cfg.odim * 2


def test_invalid_configs_raise():
    with pytest.raises(ValueError):
        tiny_config(max_dur=5, reduction_factor=2)  # not divisible
    with pytest.raises(ValueError):
        tiny_config(elayers=0, econv_layers=0)  # empty encoder
    with pytest.raises(ValueError):
        tiny_config(use_masking=True, use_weighted_masking=True)
    with pytest.raises(ValueError):
        tiny_config(dlayers=0)
    with pytest.raises(ValueError):
        tiny_config(compute_dtype="float16")
    with pytest.raises(ValueError):
        tiny_config(elayers=1, eunits=15)  # odd eunits


def test_kd_rejects_non_reference_topology():
    with pytest.raises(ValueError):
        KDStudent(tiny_config(dlayers=3), tiny_config())
    with pytest.raises(ValueError):
        KDStudent(tiny_config(), tiny_config(elayers=2))
    with pytest.raises(ValueError):
        KDStudent(tiny_config(postnet_layers=2), tiny_config())


def test_capture_kd_rejects_unsupported_topology():
    cfg = tiny_config(dlayers=3)
    batch = synthetic_batch(cfg)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        model.loss_fn(params, state, batch, jax.random.PRNGKey(1),
                      capture_kd=True)


def test_scan_unroll_is_loss_neutral():
    """decoder_scan_unroll only changes the compiled loop structure —
    losses and gradients must match unroll=1 exactly (same ops, same RNG
    streams)."""
    cfg1 = tiny_config()
    cfg4 = cfg1.replace(decoder_scan_unroll=4)
    batch = synthetic_batch(cfg1, B=2, Tmax=4, n_seg=8)
    _, _, _, loss1, _, g1 = _loss_and_grads(cfg1, batch)
    _, _, _, loss4, _, g4 = _loss_and_grads(cfg4, batch)
    assert loss1 == loss4, (loss1, loss4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
