"""Profiling/tracing (SURVEY.md §5): the reference only printed
tokens/sec from ``Statistics``; here we expose the real TPU story —
``jax.profiler`` traces viewable in TensorBoard/Perfetto, plus a simple
step-time recorder for quick percentile readouts without any viewer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Wrap a training region in a jax.profiler trace when log_dir is set
    (view with TensorBoard's profile plugin or ui.perfetto.dev)."""
    if not log_dir:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
    except Exception as e:  # some remote backends don't support tracing
        print(f"warning: jax.profiler unavailable ({e}); continuing untraced")
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


class StepTimer:
    """Wall-clock per-step timer with percentile summary (device-async aware:
    call mark() after a block_until_ready or metric sync)."""

    def __init__(self) -> None:
        self.times: List[float] = []
        self._last: Optional[float] = None

    def mark(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)

        def pct(p: float) -> float:
            return ts[min(len(ts) - 1, int(p * len(ts)))]

        return {
            "steps": len(ts),
            "mean_ms": 1000 * sum(ts) / len(ts),
            "p50_ms": 1000 * pct(0.50),
            "p90_ms": 1000 * pct(0.90),
            "p99_ms": 1000 * pct(0.99),
        }
