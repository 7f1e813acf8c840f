"""Profiling: XLA traces, step timing, and throughput meters.

Replaces the reference's scattered wall-clock heuristics (reference:
map_nav_src/utils/logger.py:21-57 Timer/ETA; pretrain tok_per_s counters,
train_r2r_magic.py:464-584; pynvml GPU monitors, pretrain_src/data/
common.py:171-225) with the TPU-native tooling: ``jax.profiler`` traces
(viewable in Perfetto/TensorBoard) and first-class steps/sec meters.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profile for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (shows up in the timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Blocking step timer + running throughput (nav steps/sec, items/sec)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return False

    @property
    def mean(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n

    def throughput(self, units_per_step: float) -> float:
        return units_per_step / self.mean if self.mean > 0 else 0.0


def device_memory_stats() -> dict:
    """Per-device memory usage (the pynvml-monitor counterpart)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", 0),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                "bytes_limit": s.get("bytes_limit", 0),
            }
        except Exception:
            out[str(d)] = {}
    return out
