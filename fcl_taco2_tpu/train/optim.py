"""Optimizers: adam / noam / lamb with grad clipping + non-finite guard.

Reference: adam(lr=1e-3, eps=1e-6, wd=0) or espnet noam or apex FusedLAMB
(/root/reference/tts.py:396-412), grad-norm clip 1.0 (tts_train.py:243,
tts.py:173), NaN-grad skip (tts.py:175-178), gradient accumulation via
deferred stepping (tts.py:156-170).

TPU-native: pure optax chain compiled into the train step; the NaN guard is
optax.apply_if_finite (skips the update and keeps optimizer state), grad
accumulation is optax.MultiSteps.
"""

import jax.numpy as jnp
import optax


def noam_schedule(lr_factor: float, model_size: int, warmup_steps: int):
    """espnet NoamOpt learning rate:
    lr_factor * model_size^-0.5 * min(step^-0.5, step * warmup^-1.5)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32) + 1.0  # noam counts from 1
        return (lr_factor * model_size ** -0.5
                * jnp.minimum(step ** -0.5, step * warmup_steps ** -1.5))

    return schedule


def build_optimizer(name="adam", lr=1e-3, eps=1e-6, weight_decay=0.0,
                    grad_clip=1.0, accum_grad=1, noam_model_size=512,
                    noam_warmup=25000, nan_guard=True, freeze_mods=None):
    if name == "adam":
        core = optax.adamw(lr, eps=eps, weight_decay=weight_decay) \
            if weight_decay else optax.adam(lr, eps=eps)
    elif name == "noam":
        core = optax.adam(
            noam_schedule(lr, noam_model_size, noam_warmup), b1=0.9,
            b2=0.98, eps=1e-9)
    elif name == "lamb":
        core = optax.lamb(lr, eps=eps, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    # --freeze-mods (tts.py:380-393): zero frozen grads BEFORE the clip,
    # so the global norm covers exactly the trainable set (the reference
    # filters frozen params out of the optimizer), and zero updates again
    # AFTER the core so adamw/lamb weight decay cannot move frozen params
    zero_frozen = None
    if freeze_mods:
        from fcl_taco2_tpu.train.finetune import freeze_mask_fn
        zero_frozen = optax.masked(optax.set_to_zero(),
                                   freeze_mask_fn(freeze_mods))

    parts = []
    if grad_clip and grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(core)
    if zero_frozen is not None:
        parts.append(zero_frozen)
    tx = optax.chain(*parts)
    if nan_guard:
        # skip the step on non-finite grads (reference NaN guard,
        # tts.py:175-178); never give up permanently
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10 ** 8)
    if zero_frozen is not None:
        # outside the NaN guard: a non-finite grad in a frozen (never
        # applied) subtree must not veto the step — in the reference,
        # frozen params produce no grads at all
        tx = optax.chain(zero_frozen, tx)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx
