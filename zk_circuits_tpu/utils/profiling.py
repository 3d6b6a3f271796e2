"""Stage timing + device tracing for the prover pipeline.

The reference's observability is minimal (println! progress + criterion
harnesses, SURVEY.md §5); qp-plonky2 has an internal `timing!` facility.
This is the TPU-native analog:

- ``stage_timer(name)`` — nested wall-clock stage timers.  Enabled with
  ``ZKT_TIMING=1`` (prints one line per stage, indented by nesting depth);
  timings are always collected into ``get_timings()`` for programmatic use
  (bench harnesses) regardless of the env toggle.
- ``device_trace(label)`` — wraps ``jax.profiler.trace`` when
  ``ZKT_PROFILE_DIR`` is set, producing a TensorBoard/XProf trace of every
  XLA computation inside the region.  No-op otherwise (zero overhead).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

_DEPTH = 0
_TIMINGS: dict[str, list[float]] = defaultdict(list)


def timing_enabled() -> bool:
    return bool(os.environ.get("ZKT_TIMING"))


@contextlib.contextmanager
def stage_timer(name: str):
    """Time a pipeline stage; nested stages print indented."""
    global _DEPTH
    t0 = time.perf_counter()
    _DEPTH += 1
    try:
        yield
    finally:
        _DEPTH -= 1
        dt = time.perf_counter() - t0
        _TIMINGS[name].append(dt)
        if timing_enabled():
            print(f"[timing] {'  ' * _DEPTH}{name}: {dt:.3f}s", flush=True)


def get_timings() -> dict[str, list[float]]:
    """All collected stage timings this process (name -> list of seconds)."""
    return dict(_TIMINGS)


def reset_timings() -> None:
    _TIMINGS.clear()


def dump_timings(path: str) -> None:
    """Write collected timings as JSON (per-stage total/count/mean)."""
    summary = {
        name: {
            "total_s": sum(v),
            "count": len(v),
            "mean_s": sum(v) / len(v),
        }
        for name, v in _TIMINGS.items()
    }
    with open(path, "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)


@contextlib.contextmanager
def device_trace(label: str = "zk"):
    """XLA-level profiler trace (TensorBoard format) when ZKT_PROFILE_DIR
    is set; inert otherwise."""
    trace_dir = os.environ.get("ZKT_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
