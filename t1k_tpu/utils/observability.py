"""Structured logging, per-stage metrics, and device profiling.

The reference only logs timestamped lines to stderr; here every pipeline
stage additionally records wall time and throughput counters that are
serialized to <prefix>_metrics.json, and a jax.profiler trace can be
captured around any stage (T1K_PROFILE_DIR=... enables it).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class Metrics:
    stages: Dict[str, dict] = field(default_factory=dict)

    def record(self, stage: str, seconds: float, **counters) -> None:
        entry = {"seconds": round(seconds, 4)}
        for k, v in counters.items():
            entry[k] = v
            if k.endswith("_count") and seconds > 0:
                entry[k[:-6] + "_per_s"] = round(v / seconds, 2)
        self.stages[stage] = entry

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.stages, f, indent=2)
            f.write("\n")


_current = Metrics()


def metrics() -> Metrics:
    return _current


def reset_metrics() -> Metrics:
    global _current
    _current = Metrics()
    return _current


@contextlib.contextmanager
def stage(name: str, **counters):
    """Time a pipeline stage; counters may be filled in by the caller via
    the yielded dict.  A device profile is captured when T1K_PROFILE_DIR
    is set."""
    ctx = dict(counters)
    profile_dir = os.environ.get("T1K_PROFILE_DIR")
    prof = None
    if profile_dir:
        import jax

        prof = jax.profiler.trace(os.path.join(profile_dir, name))
        prof.__enter__()
    t0 = time.perf_counter()
    try:
        yield ctx
    finally:
        dt = time.perf_counter() - t0
        if prof is not None:
            prof.__exit__(None, None, None)
        _current.record(name, dt, **ctx)
        ts = time.strftime("%a %b %d %H:%M:%S %Y")
        extras = " ".join(f"{k}={v}" for k, v in ctx.items())
        print(f"[{ts}] stage {name} finished in {dt:.2f}s {extras}",
              file=sys.stderr)
