"""Profiling / tracing hooks (SURVEY.md §5.1).

The reference only has wall-clock spans at call sites (tsu/api.py:88-104).
Here: the same lightweight timing metadata PLUS real device profiling via
``jax.profiler`` (TensorBoard / Perfetto traces of kernels and collectives).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


def enable_compilation_cache(path: str = "/tmp/tsu_tpu_jax_cache") -> None:
    """Turn on JAX's persistent compilation cache.

    First-call compiles on the tunneled TPU cost 30-240 s per program (r2
    weakness #2); caching them on disk makes every later process (benchmark
    re-runs, driver rounds, CI retries) hit warm. Safe to call repeatedly.
    """
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover — older jax without these flags
        pass


@contextlib.contextmanager
def trace(dir: str = "/tmp/tsu_tpu_trace") -> Iterator[None]:
    """Capture a device trace around a block:

        with profiling.trace("/tmp/trace"):
            samples = grid.sample(100)

    View with TensorBoard (profile plugin) or Perfetto.
    """
    jax.profiler.start_trace(dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Timer:
    """Wall-clock span with device synchronization (fetch-based: on tunneled
    backends block_until_ready under-reports; see bench.py)."""

    def __init__(self, sync_array=None):
        self.sync_array = sync_array
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync_array is not None:
            jax.device_get(jax.tree.leaves(self.sync_array)[0])
        self.elapsed = time.perf_counter() - self._t0
        return False
