"""KD training orchestration: Trainer specialization running teacher +
student in one jitted step.

Replaces /root/reference/tts_distill.py:312-623: builds the frozen teacher
from its config + checkpoint (mandatory, tts_distill.py:370-375), then runs
the standard loop with the distillation loss.
"""

import dataclasses

import jax

from fcl_taco2_tpu.models.kd import KDStudent
from fcl_taco2_tpu.train.checkpoint import load_params_only, save_model_json
from fcl_taco2_tpu.train.loop import Trainer
from fcl_taco2_tpu.train.step import make_kd_eval_step, make_kd_train_step


class _StudentShim:
    """Adapter: Trainer expects .cfg and .init; KD owns the real loss."""

    def __init__(self, kd: KDStudent):
        self.cfg = kd.scfg
        self._kd = kd

    def init(self, key):
        return self._kd.init(key)


class KDTrainer(Trainer):
    def __init__(self, kd: KDStudent, tcfg, train_utts, val_utts,
                 teacher_checkpoint: str, mesh=None, cache_features=True):
        self.kd = kd
        super().__init__(_StudentShim(kd), tcfg, train_utts, val_utts,
                         mesh=mesh, cache_features=cache_features)
        # the teacher checkpoint is REQUIRED (tts_distill.py:370-375)
        from fcl_taco2_tpu.utils.device import (device_put_via_jit as put,
                                                 zeros_like_shapes)
        t_template, t_state_template = zeros_like_shapes(
            kd.teacher.init, jax.random.PRNGKey(0))
        t_params, t_state = load_params_only(
            teacher_checkpoint, t_template, t_state_template)
        # transfer the frozen teacher ONCE (passing host numpy each step
        # would re-upload ~100MB per iteration on remote-attached TPUs)
        self.teacher_params = put(t_params)
        self.teacher_state = put(t_state)
        save_model_json(tcfg.exp_dir, kd.scfg, extra={
            "train_config": dataclasses.asdict(tcfg),
            "teacher_config": dataclasses.asdict(kd.tcfg),
            "teacher_checkpoint": teacher_checkpoint,
        })

    def _build_steps(self):
        self._report_keys = []  # packed reports, as in Trainer._build_steps
        self._kd_train_step = make_kd_train_step(
            self.kd, self.tx, self.mesh, report_keys=self._report_keys)
        self._kd_eval_step = make_kd_eval_step(self.kd, self.mesh)
        # KD steps close over the frozen teacher (extra args), so the
        # chained multi-step dispatch is not wired for them
        self.chain_step = None
        self._spd = 1
        if self.tcfg.steps_per_dispatch > 1:
            print("steps_per_dispatch: not supported for KD training; "
                  "running one step per dispatch", flush=True)

    def _run_train_step(self, ts, batch, rng):
        return self._kd_train_step(ts, self.teacher_params,
                                   self.teacher_state, batch, rng)

    def _run_eval_step(self, ts, batch, rng):
        return self._kd_eval_step(ts.params, ts.model_state,
                                  self.teacher_params, self.teacher_state,
                                  batch, rng)
