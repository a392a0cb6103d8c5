"""Profiling hooks (SURVEY.md §5.1).

The reference has no tracing beyond per-iteration timers and hardcoded CUDA
debug env vars (``main_generation.py:6-7``, ``misc.py:126-164``). The
TPU-native equivalents:

- :func:`maybe_trace`: wrap any region in a ``jax.profiler`` trace when a
  profile dir is configured (``system.profile_dir`` or ``RALD_PROFILE_DIR``)
  — output opens in TensorBoard / Perfetto;
- :func:`annotate`: named TraceAnnotation for step phases;
- the per-iteration iter/data timers live in
  :class:`rald_tpu.train.metrics.MetricLogger.log_every`.
"""
from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


def profile_dir_from(cfg=None) -> Optional[str]:
    env = os.environ.get("RALD_PROFILE_DIR")
    if env:
        return env
    if cfg is not None:
        return cfg.get("system", {}).get("profile_dir")
    return None


@contextlib.contextmanager
def maybe_trace(cfg=None, profile_dir: Optional[str] = None):
    """Trace the enclosed region iff a profile dir is configured."""
    d = profile_dir or profile_dir_from(cfg)
    if not d:
        yield
        return
    os.makedirs(d, exist_ok=True)
    with jax.profiler.trace(d):
        yield


def annotate(name: str):
    """Named sub-region inside a trace (shows up on the TPU timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating wall-clock attribution for a host-driven loop.

    ``with st("stage"): ...`` adds the block's wall time to that stage's
    bucket; :meth:`report` returns ``{stage: seconds}``. When ``enabled`` is
    False every operation is a no-op so the instrumented code path costs
    nothing in production. ``block=True`` regions additionally
    ``jax.block_until_ready`` their result so async device work is charged
    to the stage that launched it (profiling only — it serializes the
    host/device overlap it measures).
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.seconds: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def __call__(self, stage: str):
        if not self.enabled:
            yield
            return
        import time

        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.seconds[stage] = self.seconds.get(stage, 0.0) + dt
            self.counts[stage] = self.counts.get(stage, 0) + 1

    def block(self, value):
        """Block on ``value`` iff profiling (so async dispatches get charged
        to the stage that launched them); returns ``value`` either way."""
        if self.enabled:
            jax.block_until_ready(value)
        return value

    def report(self) -> dict:
        return dict(sorted(self.seconds.items(), key=lambda kv: -kv[1]))
