#!/usr/bin/env python3
"""Host-side regroup-plan builder benchmark: numpy vs native C++.

The per-batch host work on the training input pipeline is building the
phoneme regroup plan (flat or duration-classed).  The reference does this
with per-phoneme Python loops inside the converter
(/root/reference/tts.py:243-263); here the numpy builders are vectorized
and native/fclrt.cpp removes the remaining interpreter overhead — this
records how much, at production shapes (B=16, 96 phonemes/utt, mean dur
8, classes 8/16/32/50), so the "native host runtime" claim carries a
measurement.  Host-only: runs with the TPU relay down.

Writes results/NATIVE_runtime.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcl_taco2_tpu.data.native import (build_classed_plan_native,  # noqa: E402
                                       build_plan_native, native_available)
from fcl_taco2_tpu.ops.regroup import (build_classed_plan,  # noqa: E402
                                       build_plan, duration_class_caps)

B, TMAX, MEAN_DUR, MAX_DUR = 16, 96, 8, 50
CLASSES = (8, 16, 32, 50)


def _batch(seed):
    rng = np.random.default_rng(seed)
    durations = np.clip(rng.poisson(MEAN_DUR, (B, TMAX)), 1,
                        MAX_DUR).astype(np.int32)
    olens = durations.sum(1).astype(np.int32)
    Lmax = int(np.ceil(olens.max() / 64) * 64)
    return durations, olens, Lmax


def _time(fn, reps=200):
    fn(0)  # warm (native: builds/loads the .so)
    t0 = time.perf_counter()
    for r in range(reps):
        fn(r)
    return (time.perf_counter() - t0) / reps


def main():
    assert native_available(), "C++ toolchain required for this benchmark"
    batches = [_batch(s) for s in range(16)]
    caps = duration_class_caps([b[0][i] for b in batches for i in range(B)],
                               CLASSES, B, cap_bucket=64)

    def flat_np(r):
        d, o, L = batches[r % len(batches)]
        build_plan(d, o, MAX_DUR, B * TMAX, L)

    def flat_cc(r):
        d, o, L = batches[r % len(batches)]
        build_plan_native(d, o, MAX_DUR, B * TMAX, L)

    def classed_np(r):
        d, o, L = batches[r % len(batches)]
        build_classed_plan(d, o, CLASSES, caps, L)

    def classed_cc(r):
        d, o, L = batches[r % len(batches)]
        build_classed_plan_native(d, o, CLASSES, caps, L)

    rows = {}
    for name, fn in (("flat_numpy_ms", flat_np), ("flat_native_ms", flat_cc),
                     ("classed_numpy_ms", classed_np),
                     ("classed_native_ms", classed_cc)):
        rows[name] = round(_time(fn) * 1e3, 3)
    rows["flat_native_speedup"] = round(
        rows["flat_numpy_ms"] / rows["flat_native_ms"], 2)
    rows["classed_native_speedup"] = round(
        rows["classed_numpy_ms"] / rows["classed_native_ms"], 2)
    out = {
        "protocol": {
            "what": "host regroup-plan build per training batch, median-free "
                    "mean of 200 reps over 16 distinct batches",
            "shapes": {"B": B, "Tmax": TMAX, "mean_dur": MEAN_DUR,
                       "max_dur": MAX_DUR, "classes": list(CLASSES),
                       "class_caps": list(caps)},
            "host": os.uname().machine,
        },
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "NATIVE_runtime.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
