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
