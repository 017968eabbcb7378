"""Tracing / profiling subsystem.

The reference has no tracing — only tqdm progress bars (SURVEY.md §5.1;
_insert.py:227-233, _embed.py:113-114).  Here, first-class observability:

- :func:`phase` — a context manager timing a named pipeline phase.  Timings
  aggregate into a process-global registry (:func:`report`), and each phase
  also emits a ``jax.profiler.TraceAnnotation`` so phases show up on the
  TPU timeline when a profiler trace is active.
- :func:`trace_session` — wraps ``jax.profiler.start_trace``/``stop_trace``
  for capturing an XLA/TPU trace viewable in TensorBoard/Perfetto.
- :class:`Progress` — a zero-dependency progress meter (the tqdm analogue)
  that stays silent when stderr is not a TTY.
"""

from __future__ import annotations

import sys
import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Iterator

__all__ = ["phase", "report", "reset", "trace_session", "Progress"]

_LOCK = threading.Lock()
_TIMINGS: dict[str, list[float]] = defaultdict(list)


@contextmanager
def phase(name: str) -> Iterator[None]:
    """Time a named phase; nest freely.  Shows up in :func:`report` and on
    the device timeline when a profiler trace is active."""
    try:
        import jax.profiler

        annotation = jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - jax always present here
        annotation = None
    start = time.perf_counter()
    if annotation is not None:
        annotation.__enter__()
    try:
        yield
    finally:
        if annotation is not None:
            annotation.__exit__(None, None, None)
        elapsed = time.perf_counter() - start
        with _LOCK:
            _TIMINGS[name].append(elapsed)


def report() -> dict[str, dict[str, float]]:
    """Aggregated phase timings: {phase: {count, total_s, mean_s, max_s}}."""
    with _LOCK:
        return {
            name: {
                "count": len(samples),
                "total_s": sum(samples),
                "mean_s": sum(samples) / len(samples),
                "max_s": max(samples),
            }
            for name, samples in _TIMINGS.items()
            if samples
        }


def reset() -> None:
    with _LOCK:
        _TIMINGS.clear()


@contextmanager
def trace_session(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (TensorBoard/Perfetto) around a block."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Progress:
    """Minimal progress meter (the reference's tqdm analogue).  Prints a
    carriage-return line on TTY stderr; silent otherwise (CI/pytest)."""

    def __init__(self, total: int, desc: str = "", *, stream=None) -> None:
        self.total = max(total, 1)
        self.desc = desc
        self.count = 0
        self._stream = stream if stream is not None else sys.stderr
        self._tty = hasattr(self._stream, "isatty") and self._stream.isatty()
        self._start = time.perf_counter()

    def update(self, n: int = 1) -> None:
        self.count += n
        if not self._tty:
            return
        elapsed = time.perf_counter() - self._start
        rate = self.count / elapsed if elapsed > 0 else 0.0
        self._stream.write(
            f"\r{self.desc}: {self.count}/{self.total} ({rate:.1f}/s)"
        )
        self._stream.flush()

    def __enter__(self) -> "Progress":
        return self

    def __exit__(self, *exc) -> None:
        # One terminating newline whenever a \r status line was written —
        # totals are sometimes estimates, so this is the ONLY place the
        # line ends (per-update newlines glued/duplicated lines on
        # overshoot).
        if self._tty and self.count > 0:
            self._stream.write("\n")
            self._stream.flush()
