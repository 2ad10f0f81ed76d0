"""Metrics + profiler smoke tests."""

import numpy as np

from fcl_taco2_tpu.infer.metrics import (mel_cepstral_distortion, mel_l1,
                                         mel_rmse)
from fcl_taco2_tpu.train.profiler import StepTimer


def test_mcd_zero_for_identical_and_positive_otherwise():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(40, 80)).astype(np.float32)
    assert mel_cepstral_distortion(a, a) == 0.0
    b = a + rng.normal(scale=0.1, size=a.shape).astype(np.float32)
    mcd = mel_cepstral_distortion(a, b)
    assert 0 < mcd < 50
    # larger perturbation -> larger MCD
    c = a + rng.normal(scale=0.5, size=a.shape).astype(np.float32)
    assert mel_cepstral_distortion(a, c) > mcd


def test_metrics_handle_length_mismatch():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(40, 80))
    b = np.concatenate([a, rng.normal(size=(5, 80))], 0)
    assert mel_l1(a, b) == 0.0
    assert mel_rmse(a, b) == 0.0


def test_step_timer_summary():
    t = StepTimer(window=10)
    for _ in range(5):
        t.tic()
        t.toc()
    s = t.summary()
    assert set(s) == {"step_ms_p50", "step_ms_p90", "step_ms_max"}
    assert all(v >= 0 for v in s.values())


def test_cost_analysis_reports_flops():
    import jax
    import jax.numpy as jnp
    from fcl_taco2_tpu.train.profiler import cost_analysis

    jax.config.update("jax_platforms", "cpu")
    c = cost_analysis(lambda a, b: a @ b, jnp.ones((64, 32)),
                      jnp.ones((32, 16)))
    # 2*M*N*K = 2*64*16*32 = 65536 (allow backend slack)
    assert c["flops"] >= 2 * 64 * 16 * 32 * 0.9


def test_param_counts_teacher_vs_student():
    """Reference prints per-submodule trainable param counts at
    construction (e2e_tts_tacotron2_sa.py:483-517); same report here, and
    the student must be the small model (the paper's size comparison)."""
    import jax
    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.models.config import student_config, teacher_config
    from fcl_taco2_tpu.utils.summary import format_param_report, param_counts

    t_params, _ = Tacotron2SA(teacher_config(idim=70)).init(
        jax.random.PRNGKey(0))
    s_params, _ = Tacotron2SA(student_config(idim=70)).init(
        jax.random.PRNGKey(0))
    ct, cs = param_counts(t_params), param_counts(s_params)
    for k in ("encoder", "decoder", "duration_predictor", "total"):
        assert k in ct and k in cs
    assert ct["total"] > 3 * cs["total"]  # teacher 512-d vs student 256-d
    # exact leaf-sum cross-check
    assert ct["total"] == sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(t_params))
    report = format_param_report(s_params)
    assert "TOTAL" in report and "encoder" in report
