"""Phase-timer logging, drop-in compatible with the reference's log format
(log.cc:4-15): ``<msg>... done. (XmYs)`` written to the ``-l`` file
(default /dev/stderr).

Beyond the reference, every phase is also:

* recorded with sub-second resolution in :attr:`PhaseLog.timings`
  (surfaced as ``PipelineResult.timings``), and
* bracketed in a ``jax.profiler.TraceAnnotation`` so device traces
  (``HUMID_TPU_PROFILE=<dir>`` or ``pipeline.run(profile_dir=...)``)
  attribute kernels to pipeline phases.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


class PhaseLog:
    def __init__(self, path: str = "/dev/stderr"):
        parent = os.path.dirname(path)
        if parent and not os.path.isdir(parent) and not path.startswith("/dev/"):
            os.makedirs(parent, exist_ok=True)
        self._f = open(path, "w")
        self.timings: list[tuple[str, float]] = []
        self._current: str | None = None
        self._annotation = None

    def start(self, message: str) -> float:
        self._f.write(f"{message}... ")
        self._f.flush()
        self._current = message
        try:
            from jax.profiler import TraceAnnotation

            self._annotation = TraceAnnotation(message)
            self._annotation.__enter__()
        except Exception:
            self._annotation = None
        return time.time()

    def end(self, start: float) -> None:
        dt = time.time() - start
        seconds = int(dt)
        self._f.write(f"done. ({seconds // 60}m{seconds % 60}s)\n")
        self._f.flush()
        if self._annotation is not None:
            self._annotation.__exit__(None, None, None)
            self._annotation = None
        if self._current is not None:
            self.timings.append((self._current, dt))
            self._current = None

    def write(self, text: str) -> None:
        self._f.write(text)
        self._f.flush()

    def fail(self, start: float) -> None:
        """Close a phase that raised: honest log line, and the profiler
        TraceAnnotation is exited (leaving it entered would mis-attribute
        every later kernel to the dead phase)."""
        dt = time.time() - start
        self._f.write("failed.\n")
        self._f.flush()
        if self._annotation is not None:
            self._annotation.__exit__(None, None, None)
            self._annotation = None
        if self._current is not None:
            self.timings.append((self._current, dt))
            self._current = None

    @contextmanager
    def phase(self, message: str):
        t = self.start(message)
        try:
            yield
        except BaseException:
            self.fail(t)
            raise
        else:
            self.end(t)

    def close(self) -> None:
        self._f.close()
