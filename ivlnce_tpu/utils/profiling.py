"""Tracing / profiling hooks.

Reference: the only tracing in the reference is habitat's
profiling_wrapper.RangeContext NVTX annotations inside the vector-env
worker (env_utils.py:19,126,169,188,246). TPU equivalent:

- ``range_context(name)``: jax.profiler.TraceAnnotation + named_scope —
  annotates both the host timeline and the XLA trace;
- ``maybe_start_trace(dir)`` / ``maybe_stop_trace()``: on-demand
  jax.profiler capture controlled by config ``TPU.profile_dir`` (empty =
  disabled) or the IVLNCE_PROFILE_DIR env var.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

_active = False


@contextlib.contextmanager
def range_context(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


def profile_dir_from(config=None) -> Optional[str]:
    env = os.environ.get("IVLNCE_PROFILE_DIR")
    if env:
        return env
    if config is not None and "TPU" in config:
        d = getattr(config.TPU, "profile_dir", "")
        return d or None
    return None


def maybe_start_trace(config=None) -> bool:
    global _active
    d = profile_dir_from(config)
    if not d or _active:
        return False
    import jax

    os.makedirs(d, exist_ok=True)
    jax.profiler.start_trace(d)
    _active = True
    return True


def maybe_stop_trace() -> None:
    global _active
    if _active:
        import jax

        jax.profiler.stop_trace()
        _active = False


# -- wall-clock phase accounting ---------------------------------------------
# The axon/tunnel dispatch path makes device work invisible to host
# profilers and XLA traces can't see host python, so the eval/collect
# loops accumulate coarse per-phase wall times here. Enabled by the
# IVLNCE_PHASE_TIMES env var (always cheap: two perf_counter calls when
# disabled it is a no-op context).
import time as _time

_phase_times: dict = {}
_phase_counts: dict = {}
_PHASES_ON = bool(os.environ.get("IVLNCE_PHASE_TIMES"))


@contextlib.contextmanager
def wall_range(name: str):
    if not _PHASES_ON:
        yield
        return
    t0 = _time.perf_counter()
    try:
        yield
    finally:
        dt = _time.perf_counter() - t0
        _phase_times[name] = _phase_times.get(name, 0.0) + dt
        _phase_counts[name] = _phase_counts.get(name, 0) + 1


def phase_report() -> str:
    if not _phase_times:
        return ""
    total = sum(_phase_times.values())
    parts = [
        f"{k}={v:.1f}s/{_phase_counts[k]} ({100 * v / total:.0f}%)"
        for k, v in sorted(_phase_times.items(), key=lambda kv: -kv[1])
    ]
    return " ".join(parts)


def reset_phases() -> None:
    _phase_times.clear()
    _phase_counts.clear()
