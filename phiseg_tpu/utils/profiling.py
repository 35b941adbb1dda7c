"""Profiling / tracing hooks.

The reference's only tracing is wall-clock logging of the validation pass
(phiseg/phiseg_model.py:559,636). Here: jax.profiler integration producing
Perfetto/TensorBoard-compatible traces, plus timed sections.

Usage:
  PHISEG_PROFILE_DIR=/tmp/trace PHISEG_PROFILE_STEPS=5:10 python -m phiseg_tpu.cli.train ...
traces steps 5..10 into /tmp/trace, or programmatically:

  with trace_if_enabled():                 # env-gated
      ...
  with timed_section("validation"):        # wall-clock log
      ...
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger(__name__)


def profile_config():
    """(dir, start_step, stop_step) from env, or (None, -1, -1)."""
    d = os.environ.get("PHISEG_PROFILE_DIR")
    if not d:
        return None, -1, -1
    steps = os.environ.get("PHISEG_PROFILE_STEPS", "2:7")
    start, stop = (int(x) for x in steps.split(":"))
    return d, start, stop


class StepProfiler:
    """Start/stop the jax profiler around a step window of the train loop."""

    def __init__(self):
        self.dir, self.start_step, self.stop_step = profile_config()
        self._active = False

    def maybe_start(self, step: int):
        if self.dir and not self._active and step == self.start_step:
            import jax

            jax.profiler.start_trace(self.dir)
            self._active = True
            log.info("profiler: tracing steps %d..%d -> %s",
                     self.start_step, self.stop_step, self.dir)

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_step:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            log.info("profiler: trace written to %s", self.dir)


@contextlib.contextmanager
def trace_if_enabled():
    d, _, _ = profile_config()
    if not d:
        yield
        return
    import jax

    with jax.profiler.trace(d):
        yield


@contextlib.contextmanager
def timed_section(name: str):
    t0 = time.perf_counter()
    yield
    log.info("@ %s took: %.2f secs", name, time.perf_counter() - t0)
