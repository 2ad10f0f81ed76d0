"""Jitted train / eval steps with data-parallel shardings.

Replaces the reference CustomUpdater/CustomEvaluator
(/root/reference/tts.py:111-199, :53-108): one jitted, donated-buffer step
doing forward + backward + clip + NaN-guard + update; the gradient
all-reduce is compiled in by XLA from the sharding layout (parallel/mesh.py).
"""

import jax
import jax.numpy as jnp

from fcl_taco2_tpu.parallel.mesh import (batch_shardings,
                                         chained_batch_shardings, replicated)
from fcl_taco2_tpu.train.state import TrainState


def _pack_report(report, report_keys):
    """Stack the scalar report dict into ONE (K,) f32 vector inside the
    jit, recording the key order in ``report_keys`` at trace time.

    Fetching K separate device scalars per step pays the link round-trip
    per leaf on remote-attached TPUs (measured 16 ms/step even chunked,
    results/TRAIN_loop.json); one packed vector per step makes the metric
    fetch one leaf.  ``report_keys`` is a caller-owned list, (re)filled
    whenever the step traces — deterministic (sorted) so retraces agree.
    """
    keys = sorted(report)
    del report_keys[:]
    report_keys.extend(keys)
    return jnp.stack([report[k].astype(jnp.float32) for k in keys])


def make_train_step(model, tx, mesh=None, donate=True, report_keys=None):
    """Returns step(train_state, batch, rng) -> (train_state, report).

    With ``report_keys`` (a list), report is a packed (K,) f32 vector
    instead of a dict and the list receives the key order (see
    _pack_report)."""

    def step(ts: TrainState, batch, rng):
        def loss_of(params):
            loss, (report, new_state, _) = model.loss_fn(
                params, ts.model_state, batch, rng, train=True)
            return loss, (report, new_state)

        (loss, (report, new_state)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(ts.params)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, ts.params,
                                        updates)
        report = dict(report)
        report["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g)), grads, 0.0) ** 0.5
        if report_keys is not None:
            report = _pack_report(report, report_keys)
        return TrainState(params, new_state, opt_state, ts.step + 1), report

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    bsh = batch_shardings(mesh)
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(None, bsh, rep),
        out_shardings=None,
        donate_argnums=(0,) if donate else (),
    )


def make_chained_train_step(model, tx, mesh=None, donate=True,
                            report_keys=None, assemble=None):
    """Returns chained(train_state, batches, rngs) -> (train_state,
    reports): a lax.scan of the train step over a leading chain axis —
    K optimizer steps per Python dispatch.

    On remote-attached devices every dispatch costs ~10 ms of link RTT +
    host work (results/TRAIN_loop.json per_step_ms.dispatch), comparable
    to the 22 ms device step itself; scanning K pre-stacked batches
    inside one jit amortizes that K-fold.  ``batches``: the Batch pytree
    with every leaf stacked on a new leading axis (host-side np.stack in
    the loader — requires the converter's fixed shapes); ``rngs``:
    (K, 2) uint32 keys.  Reports stack to (K, n_keys) when packed.  One
    compile per distinct K (the loop uses one K plus a possible
    remainder group).

    ``assemble`` (DeviceBatchCache.raw_assemble): when given, ``batches``
    is instead a (K, P) int32 array of packed plan vectors and each scan
    iteration gathers its Batch from the device-resident dataset cache —
    K optimizer steps then cost ONE dispatch and ~K*P*4 bytes of H2D
    (the cache rides as captured device constants).  Single-device only
    (the Trainer's device-cache gate enforces it), so no mesh shardings
    apply."""

    def one_step(ts: TrainState, batch, rng):
        def loss_of(params):
            loss, (report, new_state, _) = model.loss_fn(
                params, ts.model_state, batch, rng, train=True)
            return loss, (report, new_state)

        (loss, (report, new_state)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(ts.params)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, ts.params,
                                        updates)
        report = dict(report)
        report["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g)), grads, 0.0) ** 0.5
        if report_keys is not None:
            report = _pack_report(report, report_keys)
        return TrainState(params, new_state, opt_state, ts.step + 1), report

    def chained(ts: TrainState, batches, rngs):
        def body(carry, xs):
            batch, rng = xs
            if assemble is not None:
                batch = assemble(batch)
            return one_step(carry, batch, rng)

        return jax.lax.scan(body, ts, (batches, rngs))

    if mesh is None or assemble is not None:
        return jax.jit(chained, donate_argnums=(0,) if donate else ())
    bsh = chained_batch_shardings(mesh)
    rep = replicated(mesh)
    return jax.jit(chained, in_shardings=(None, bsh, rep),
                   donate_argnums=(0,) if donate else ())


def make_kd_train_step(kd, tx, mesh=None, donate=True, report_keys=None):
    """KD step: teacher forward (stop-grad) + student update in one jit.

    Teacher params/state travel as jit ARGUMENTS (replicated), not closure
    constants, so they are not baked into the executable.  ``report_keys``
    as in make_train_step."""

    def step(ts: TrainState, t_params, t_state, batch, rng):
        def loss_of(params):
            loss, (report, new_state, _) = kd.loss_fn(
                params, ts.model_state, t_params, t_state, batch, rng,
                train=True)
            return loss, (report, new_state)

        (loss, (report, new_state)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(ts.params)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, ts.params,
                                        updates)
        report = dict(report)
        report["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g)), grads, 0.0) ** 0.5
        if report_keys is not None:
            report = _pack_report(report, report_keys)
        return TrainState(params, new_state, opt_state, ts.step + 1), report

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    bsh = batch_shardings(mesh)
    rep = replicated(mesh)
    return jax.jit(step, in_shardings=(None, None, None, bsh, rep),
                   donate_argnums=(0,) if donate else ())


def make_kd_eval_step(kd, mesh=None):
    def step(params, model_state, t_params, t_state, batch, rng):
        _, (report, _, _) = kd.loss_fn(params, model_state, t_params,
                                       t_state, batch, rng, train=False)
        return report

    if mesh is None:
        return jax.jit(step)
    bsh = batch_shardings(mesh)
    rep = replicated(mesh)
    return jax.jit(step, in_shardings=(None, None, None, None, bsh, rep))


def make_eval_step(model, mesh=None):
    """Eval step: loss/report only, model state untouched (tts.py:71-108)."""

    def step(params, model_state, batch, rng):
        _, (report, _, _) = model.loss_fn(params, model_state, batch, rng,
                                          train=False)
        return report

    if mesh is None:
        return jax.jit(step)
    bsh = batch_shardings(mesh)
    rep = replicated(mesh)
    return jax.jit(step, in_shardings=(None, None, bsh, rep))
