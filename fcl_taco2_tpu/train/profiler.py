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


class StepTimer:
    def __init__(self, window=100):
        self.window = window
        self._durs = []
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self):
        if self._t is not None:
            self._durs.append(time.perf_counter() - self._t)
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
