"""Leveled logging + debug timers.

The analog of the reference's ``APPLOG_*`` leveled printf logging
(``msb/src/utils/app_log.h:32-44``) and its ``DEBUG_LEVEL``-gated CPU/CUDA
timer macros (``msb/src/benchmark/debug_logger.h:6-65``), on top of the
stdlib logger so it composes with host applications.

Level is controlled by ``TPUSORT_LOG`` (TRACE/DEBUG/INFO/WARNING/ERROR,
default WARNING) — the runtime analog of the reference's compile-time
``DEBUG_LEVEL`` define.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Iterator

__all__ = ["logger", "timed", "set_level", "TRACE"]

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

logger = logging.getLogger("tpusort")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("[tpusort %(levelname)s %(asctime)s] %(message)s",
                          datefmt="%H:%M:%S")
    )
    logger.addHandler(_h)
    logger.propagate = False


def set_level(level) -> None:
    if isinstance(level, str):
        level = TRACE if level.upper() == "TRACE" else \
            getattr(logging, level.upper())
    logger.setLevel(level)


set_level(os.environ.get("TPUSORT_LOG", "WARNING"))


@contextlib.contextmanager
def timed(name: str, level: int = logging.DEBUG) -> Iterator[None]:
    """Wall-clock a block at the given log level (START/STOP_CPU_TIMER
    analog, ``debug_logger.h:14-29``).  Note: under jit this measures trace
    or dispatch time, not device time — use utils.timing for device timing.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.log(level, "%s: %.3f ms", name, (time.perf_counter() - t0) * 1e3)
