"""Multi-speaker conditioning path (reference spk_embed_dim,
e2e_tts_tacotron2_sa.py:555-557, 636-638)."""

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models import Tacotron2SA

from helpers import synthetic_batch, tiny_config


def test_spk_embed_loss_and_synthesize():
    cfg = tiny_config(spk_embed_dim=6)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg)
    rng = np.random.default_rng(0)
    spembs = jnp.asarray(rng.normal(size=(batch.tokens.shape[0], 6))
                         .astype(np.float32))
    batch = batch._replace(spembs=spembs)
    loss, _ = model.loss_fn(params, state, batch, jax.random.PRNGKey(1),
                            train=True)
    assert np.isfinite(float(loss))

    # different speakers -> different mels
    tokens = jnp.asarray(np.array([[1, 2, 3]], np.int32))
    ilens = jnp.asarray(np.array([3], np.int32))
    dur = jnp.asarray(np.array([[2, 2, 2]], np.int32))
    out_a = model.synthesize(params, state, tokens, ilens,
                             jax.random.PRNGKey(2), frame_budget=16,
                             durations=dur,
                             spembs=jnp.ones((1, 6)))
    out_b = model.synthesize(params, state, tokens, ilens,
                             jax.random.PRNGKey(2), frame_budget=16,
                             durations=dur,
                             spembs=-jnp.ones((1, 6)))
    assert not np.allclose(np.asarray(out_a["mel"]),
                           np.asarray(out_b["mel"]))

    # spemb normalization: scaling the embedding must not change output
    out_c = model.synthesize(params, state, tokens, ilens,
                             jax.random.PRNGKey(2), frame_budget=16,
                             durations=dur,
                             spembs=5.0 * jnp.ones((1, 6)))
    np.testing.assert_allclose(np.asarray(out_a["mel"]),
                               np.asarray(out_c["mel"]), atol=1e-5)
