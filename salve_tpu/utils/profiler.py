"""Per-stage timing + device profiling hooks.

The reference's only observability was a wall-clock AverageMeter on batch
time (salve/train_utils.py:44-54). This adds (a) a stage timer registry for
pipeline-level wall-clock accounting and (b) an optional jax.profiler trace
context for device-level traces viewable in TensorBoard/Perfetto — strictly
more than reference parity, per SURVEY.md §5.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

from salve_tpu.training.meters import AverageMeter

_STAGE_METERS: Dict[str, AverageMeter] = defaultdict(AverageMeter)


@contextlib.contextmanager
def stage_timer(stage_name: str) -> Iterator[None]:
    """Accumulate wall-clock for a named pipeline stage."""
    t0 = time.time()
    try:
        yield
    finally:
        _STAGE_METERS[stage_name].update(time.time() - t0)


def record_stage(stage_name: str, seconds: float) -> None:
    """Non-context form of stage_timer for measurements taken inline."""
    _STAGE_METERS[stage_name].update(seconds)


def stage_summary() -> Dict[str, Dict[str, float]]:
    """{stage: {total_s, mean_s, count}} for all timed stages so far."""
    return {
        name: {"total_s": m.sum, "mean_s": m.avg, "count": int(m.count)}
        for name, m in _STAGE_METERS.items()
    }


def reset_stage_timers() -> None:
    _STAGE_METERS.clear()


def save_stage_summary(json_fpath: str) -> None:
    from salve_tpu.utils.io import save_json_file

    save_json_file(json_fpath, stage_summary())


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
