"""Phase-timer logging, drop-in compatible with the reference's log format
(log.cc:4-15): ``<msg>... done. (XmYs)`` written to the ``-l`` file
(default /dev/stderr)."""

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

    def start(self, message: str) -> float:
        self._f.write(f"{message}... ")
        self._f.flush()
        return time.time()

    def end(self, start: float) -> None:
        seconds = int(time.time() - start)
        self._f.write(f"done. ({seconds // 60}m{seconds % 60}s)\n")
        self._f.flush()

    def write(self, text: str) -> None:
        self._f.write(text)
        self._f.flush()

    @contextmanager
    def phase(self, message: str):
        t = self.start(message)
        yield
        self.end(t)

    def close(self) -> None:
        self._f.close()
