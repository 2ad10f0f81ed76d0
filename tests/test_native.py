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
