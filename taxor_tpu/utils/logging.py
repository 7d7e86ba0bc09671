"""Structured logging + phase timers.

The reference's observability is stdout prose plus wall-clock phase
accumulators (SURVEY.md §5: StopClock, cputime/getPeakRSS at exit, the
search ``<out>.time`` file).  Here: Python logging with per-phase timers,
and an optional jax.profiler trace around the device compute.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("taxor_tpu")


def setup_logging(verbose: bool = False) -> None:
    level = logging.DEBUG if verbose else logging.INFO
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("[taxor %(levelname).1s %(asctime)s] "
                              "%(message)s", "%H:%M:%S")
        )
        logger.addHandler(h)
    logger.setLevel(level)


class PhaseTimer:
    """Accumulating wall-clock phase timers — the ``<out>.time`` analog
    (taxor_search.cpp:156-158,328-336)."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = (
                self.totals.get(name, 0.0) + time.perf_counter() - t0
            )

    def write(self, path: str, order: list[str]) -> None:
        with open(path, "w") as fh:
            fh.write("\t".join(order) + "\n")
            fh.write("\t".join(f"{self.totals.get(k, 0.0):.2f}"
                               for k in order))


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """jax.profiler trace wrapper; no-op when trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
