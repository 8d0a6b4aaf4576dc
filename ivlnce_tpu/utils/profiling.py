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
