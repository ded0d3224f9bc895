"""Misc host-side helpers.

Parity: reference DSS/misc/__init__.py — the timing `Thread` wrapper
used for async plot/artifact export (visualization must not stall the
train loop).
"""

import threading
import time
from typing import Callable, Optional

from isopoints_tpu.logger import get_logger


class TimedThread(threading.Thread):
    """Run fn(*args) on a thread, log the wall time when it finishes
    (DSS/misc/__init__.py:6-17)."""

    def __init__(self, fn: Callable, *args, name: Optional[str] = None,
                 **kwargs):
        super().__init__(daemon=True)
        self._fn = fn
        self._args = args
        self._kwargs = kwargs
        self._label = name or getattr(fn, "__name__", "task")

    def run(self):
        t0 = time.time()
        try:
            self._fn(*self._args, **self._kwargs)
        except Exception as e:  # visualization must never kill training
            get_logger().warning("async %s failed: %s", self._label, e)
            return
        get_logger().debug("async %s done in %.1fs", self._label,
                           time.time() - t0)


def run_async(fn: Callable, *args, **kwargs) -> TimedThread:
    t = TimedThread(fn, *args, **kwargs)
    t.start()
    return t
