"""Knowledge distillation: loss assembly, toggles, gradient isolation."""

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models.kd import KDStudent

from helpers import synthetic_batch, tiny_config


def _setup(**kd_flags):
    tcfg = tiny_config()
    scfg = tiny_config(embed_dim=8, eunits=8, econv_chans=8, dunits=12,
                       prenet_units=6, postnet_chans=6)
    kd = KDStudent(scfg, tcfg, **kd_flags)
    t_params, t_state = kd.teacher.init(jax.random.PRNGKey(0))
    s_params, s_state = kd.init(jax.random.PRNGKey(1))
    batch = synthetic_batch(tcfg)
    return kd, t_params, t_state, s_params, s_state, batch


def test_kd_loss_terms_present_and_finite():
    kd, tp, tst, sp, sst, batch = _setup()
    loss, (report, _, _) = kd.loss_fn(sp, sst, tp, tst, batch,
                                      jax.random.PRNGKey(2), train=True)
    assert np.isfinite(float(loss))
    for k in ["l1_loss", "mse_loss", "dur_loss", "pitch_loss", "energy_loss",
              "output_l1_loss", "output_mse_loss", "encoder_loss",
              "decoder_loss", "prosody_loss", "loss"]:
        assert k in report and np.isfinite(float(report[k])), k


def test_kd_toggles_remove_terms():
    kd, tp, tst, sp, sst, batch = _setup(
        distill_output=False, distill_encoder=False, distill_decoder=False,
        distill_prosody=False)
    loss, (report, _, _) = kd.loss_fn(sp, sst, tp, tst, batch,
                                      jax.random.PRNGKey(2), train=True)
    for k in ["output_l1_loss", "encoder_loss", "decoder_loss",
              "prosody_loss"]:
        assert k not in report, k


def test_teacher_gets_no_gradient():
    kd, tp, tst, sp, sst, batch = _setup()

    def loss_of(sp_, tp_):
        return kd.loss_fn(sp_, sst, tp_, tst, batch, jax.random.PRNGKey(2),
                          train=True)[0]

    g_teacher = jax.grad(loss_of, argnums=1)(sp, tp)
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(g_teacher))
    assert total == 0.0


def test_kd_projections_receive_gradient_and_student_trains():
    import optax

    kd, tp, tst, sp, sst, batch = _setup()
    tx = optax.adam(1e-3)
    ost = tx.init(sp)

    @jax.jit
    def step(sp, sst, ost, key):
        (loss, (_, new_sst, _)), grads = jax.value_and_grad(
            kd.loss_fn, has_aux=True)(sp, sst, tp, tst, batch, key,
                                      train=True)
        # every projection must be learning
        pg = grads["kd_proj"]
        updates, ost = tx.update(grads, ost)
        return optax.apply_updates(sp, updates), new_sst, ost, loss, pg

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(15):
        key, sub = jax.random.split(key)
        sp, sst, ost, loss, pg = step(sp, sst, ost, sub)
        losses.append(float(loss))
    for path, g in jax.tree_util.tree_leaves_with_path(pg):
        assert float(jnp.max(jnp.abs(g))) > 0, jax.tree_util.keystr(path)
    assert losses[-1] < losses[0], losses


def test_kd_share_proj_false_keys_and_loss():
    """Non-shared projections: distinct per-layer weights (regression for
    a PRNG key collision between post2/post3 and pemb/eemb)."""
    kd, tp, tst, sp, sst, batch = _setup(share_proj=False)
    proj = sp["kd_proj"]
    assert len(proj["convs"]) == 2 and len(proj["lstm"]) == 2
    # no two projection matrices of equal shape may be identical
    import numpy as _np
    mats = [_np.asarray(proj["post"][i]["w"]) for i in range(len(proj["post"]))]
    mats += [_np.asarray(proj["pemb"]["w"]), _np.asarray(proj["eemb"]["w"])]
    for i in range(len(mats)):
        for j in range(i + 1, len(mats)):
            if mats[i].shape == mats[j].shape:
                assert not _np.array_equal(mats[i], mats[j]), (i, j)
    loss, (report, _, _) = kd.loss_fn(sp, sst, tp, tst, batch,
                                      jax.random.PRNGKey(2), train=True)
    assert np.isfinite(float(loss))


def test_kd_step_multi_device():
    """KD train step over an 8-device data mesh == semantics-preserving."""
    from fcl_taco2_tpu.parallel.mesh import make_mesh, shard_batch
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState
    from fcl_taco2_tpu.train.step import make_kd_train_step
    import numpy as _np

    tcfg = tiny_config()
    scfg = tiny_config(embed_dim=8, eunits=8, econv_chans=8, dunits=12,
                       prenet_units=6, postnet_chans=6)
    kd = KDStudent(scfg, tcfg)
    tp, tst = kd.teacher.init(jax.random.PRNGKey(0))
    sp, sst = kd.init(jax.random.PRNGKey(1))
    batch = synthetic_batch(tcfg, B=8, Tmax=5, n_seg=32)
    mesh = make_mesh(8)
    batch = shard_batch(mesh, batch)
    tx = build_optimizer()
    ts = TrainState(sp, sst, tx.init(sp), _np.int32(0))
    step = make_kd_train_step(kd, tx, mesh, donate=False)
    ts, report = step(ts, tp, tst, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(report["loss"]))
    assert int(ts.step) == 1
