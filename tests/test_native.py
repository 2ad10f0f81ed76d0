"""Native (C++) plan builder vs the numpy implementation."""

import numpy as np
import pytest

from fcl_taco2_tpu.data.native import build_plan_native, native_available
from fcl_taco2_tpu.ops.regroup import build_plan

from test_ops_regroup import make_case


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_plan_matches_numpy():
    for seed in range(5):
        durations, ilens, olens, ys = make_case(seed=seed)
        D = 7
        a = build_plan(durations, olens, D, 16, ys.shape[1])
        b = build_plan_native(durations, olens, D, 16, ys.shape[1])
        assert a.n_segments == b.n_segments
        for field in a._fields:
            if field == "n_segments":
                continue
            np.testing.assert_array_equal(
                np.asarray(getattr(a, field)),
                np.asarray(getattr(b, field)), err_msg=field)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_plan_overflow_raises():
    durations = np.full((1, 4), 3, np.int32)
    with pytest.raises(ValueError, match="overflow"):
        build_plan_native(durations, durations.sum(1), max_dur=3,
                          n_seg_padded=2, max_olen=12)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_classed_plan_matches_numpy():
    from fcl_taco2_tpu.data.native import build_classed_plan_native
    from fcl_taco2_tpu.ops.regroup import build_classed_plan

    for seed in range(5):
        rng = np.random.default_rng(seed)
        B, Tmax = 3, 9
        durations = rng.integers(0, 8, (B, Tmax)).astype(np.int32)
        durations[:, 0] = np.maximum(durations[:, 0], 1)
        olens = durations.sum(1).astype(np.int32)
        Lmax = int(olens.max()) + 3
        class_durs = (2, 4, 7)
        # tight lower caps exercise the upward-spill path; the top class
        # always has room
        caps = (2, 4, Tmax * B) if seed == 0 else (8, 8, Tmax * B)
        a = build_classed_plan(durations, olens, class_durs, caps, Lmax)
        b = build_classed_plan_native(durations, olens, class_durs, caps,
                                      Lmax)
        assert a.n_segments == b.n_segments
        np.testing.assert_array_equal(a.utt_gather, b.utt_gather)
        np.testing.assert_array_equal(a.utt_mask, b.utt_mask)
        assert len(a.classes) == len(b.classes)
        for ca, cb in zip(a.classes, b.classes):
            assert ca.dur_cap == cb.dur_cap
            for field in ca._fields:
                if field == "dur_cap":
                    continue
                np.testing.assert_array_equal(
                    np.asarray(getattr(ca, field)),
                    np.asarray(getattr(cb, field)),
                    err_msg=f"seed={seed} {field}")


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_classed_plan_errors_match_numpy():
    from fcl_taco2_tpu.data.native import build_classed_plan_native

    durations = np.full((1, 4), 3, np.int32)
    olens = durations.sum(1)
    with pytest.raises(ValueError, match="overflow"):
        build_classed_plan_native(durations, olens, (2, 4), (1, 1), 12)
    with pytest.raises(ValueError, match="top class cap"):
        build_classed_plan_native(durations, olens, (1, 2), (8, 8), 12)
    # frames past max_olen must be a loud error, never an out-of-bounds
    # write into the caller's utt_gather buffer
    with pytest.raises(ValueError, match="max_olen"):
        build_classed_plan_native(durations, olens, (2, 4), (8, 8), 4)
