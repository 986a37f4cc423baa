"""Process-level runtime setup shared by CLIs and bench.

- persistent XLA compilation cache (first compile of each program shape
  is minutes on remote-compile links; cached reruns are instant);
- optional jax.profiler trace capture around a scope.
"""

from __future__ import annotations

import contextlib
import os


def setup(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "HNT_COMPILE_CACHE", os.path.expanduser("~/.cache/hover_net_tpu/xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache support varies by backend; never fatal
        pass


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """`with profile_trace("/tmp/trace"):` captures a TensorBoard-viewable
    device trace of the enclosed scope (the framework's analog of the
    reference's wall-clock stage timers, upgraded to real device data)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
