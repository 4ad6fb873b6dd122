"""In-product stage timing + optional device tracing (SURVEY §5).

The reference's only observability is ``log::debug!`` breadcrumbs in the
hot paths (src/correct/mod.rs:86,93); here every pipeline stage is timed
into a process-wide registry, reported through the ``-v`` debug channel,
and ``--trace DIR`` wraps the run in a ``jax.profiler`` trace for XLA-level
analysis (the TPU-native upgrade SURVEY §5 calls for).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

log = logging.getLogger("br_tpu")

_STAGES: dict = defaultdict(lambda: [0, 0.0])  # name -> [calls, seconds]


@contextlib.contextmanager
def stage(name: str):
    """Time a pipeline stage; accumulate + emit a debug breadcrumb."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        s = _STAGES[name]
        s[0] += 1
        s[1] += dt
        log.debug("stage %s: %.3fs (total %.3fs over %d calls)",
                  name, dt, s[1], s[0])


def stage_totals() -> dict:
    """{name: (calls, seconds)} accumulated so far."""
    return {k: tuple(v) for k, v in _STAGES.items()}


def reset_stages() -> None:
    _STAGES.clear()


def report(level=logging.INFO) -> None:
    """Log one summary line per stage (the -v run report)."""
    for name, (calls, secs) in sorted(_STAGES.items(),
                                      key=lambda kv: -kv[1][1]):
        log.log(level, "stage %-18s %8.3fs  %6d calls", name, secs, calls)


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace of the whole run when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    log.info("device trace written to %s", trace_dir)
