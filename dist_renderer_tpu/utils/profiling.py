"""Tracing / profiling utilities (SURVEY.md §5 'Tracing / profiling').

Reference analog: ad-hoc wall-clock prints around the march loop used for
the paper's speed ablations. Rebuild: jax.profiler trace annotations
around march/compaction/loss phases, per-step live-ray telemetry (already
computed by the tracers as `live_counts`), Perfetto dumps, and a
wall-clock timer that understands async dispatch."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device profile (shows up in Perfetto/XProf)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_profile(out_dir: str) -> Iterator[None]:
    """Capture a device trace (open the result with Perfetto / XProf)."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timing that blocks on async device work."""

    def __init__(self):
        self.records: Dict[str, list] = {}

    @contextlib.contextmanager
    def time(self, name: str, result: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def timeit(self, name: str, fn, *args, warmup: int = 1, iters: int = 5):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        self.records.setdefault(name, []).append(
            (time.perf_counter() - t0) / iters
        )
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "mean_ms": float(np.mean(v) * 1e3),
                "min_ms": float(np.min(v) * 1e3),
                "count": len(v),
            }
            for k, v in self.records.items()
        }

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2)
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            with open(path, "w") as f:
                f.write(s)
        return s


def march_efficiency(trace_result) -> Dict[str, float]:
    """Live-ray telemetry -> work-efficiency stats (SURVEY.md §5: per-step
    live-ray-count telemetry is cheap, already computed for the
    convergence predicate)."""
    live = np.asarray(trace_result.live_counts)
    live = live[live > 0]
    if live.size == 0:
        return {"ray_steps": 0.0, "naive_ray_steps": 0.0, "savings": 1.0}
    n0 = float(live[0])
    total = float(live.sum())
    naive = n0 * len(live)
    return {
        "ray_steps": total,
        "naive_ray_steps": naive,
        "savings": naive / max(total, 1.0),
        "steps_used": int(len(live)),
    }
