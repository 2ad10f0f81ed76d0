"""Tracing / profiling hooks (SURVEY.md §5.1 TPU equivalent).

The reference only wall-clocks decode frames/sec (tts.py:665-684) and has a
commented-out per-iteration timer (tts.py:183-186).  Here:

- ``trace(dir)``: context manager around jax.profiler (XLA device traces,
  viewable in tensorboard/xprof)
- ``StepTimer``: cheap per-step wall timing with periodic summaries
  (p50/p90/max), reported through the Reporter
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir):
    """Capture an XLA device trace into ``log_dir`` (xprof format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args):
    """Compiled-program cost estimate for a jittable fn (FLOPs, bytes).

    The reference imports the `thop` FLOPs profiler but never invokes it
    (tts_distill.py:50-51); XLA's own cost analysis gives the real number
    for the compiled program."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # some backends return one dict per program
        costs = costs[0] if costs else {}
    return {
        "flops": float(costs.get("flops", -1.0)),
        "bytes_accessed": float(costs.get("bytes accessed", -1.0)),
    }


class StepTimer:
    def __init__(self, window=100):
        self.window = window
        self._durs = []
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self, n=1):
        """``n``: optimizer steps covered by this dispatch (a chained
        dispatch records its wall divided by its step count, so the
        summary percentiles stay per-STEP)."""
        if self._t is not None:
            self._durs.append((time.perf_counter() - self._t) / max(1, n))
            self._t = None
            if len(self._durs) > self.window:
                self._durs = self._durs[-self.window:]

    def summary(self):
        if not self._durs:
            return {}
        d = np.asarray(self._durs)
        return {
            "step_ms_p50": float(np.percentile(d, 50) * 1e3),
            "step_ms_p90": float(np.percentile(d, 90) * 1e3),
            "step_ms_max": float(d.max() * 1e3),
        }
