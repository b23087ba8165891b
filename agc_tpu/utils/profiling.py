"""Stage timing + device profiling hooks.

The reference has no profiling beyond wall-clock (SURVEY.md section 5);
here per-stage timers and bases/s counters are first-class, and the JAX
device profiler can wrap any region (AGC_TPU_PROFILE_DIR=… enables a
trace usable with TensorBoard/XProf).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


class StageTimers:
    """Accumulates wall time + units (bases) per pipeline stage."""

    def __init__(self):
        self.times: dict[str, float] = defaultdict(float)
        self.units: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, units: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.units[name] += units

    def report(self) -> str:
        lines = ["*** Stage timings ***"]
        for name in sorted(self.times, key=lambda n: -self.times[n]):
            t = self.times[name]
            u = self.units[name]
            rate = f"  {u / t / 1e6:8.2f} Mbases/s" if u and t > 0 else ""
            lines.append(f"{name:28s}: {t:8.3f} s{rate}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(label: str = "agc_tpu"):
    """Wrap a region in a JAX profiler trace when AGC_TPU_PROFILE_DIR is
    set; no-op otherwise."""
    trace_dir = os.environ.get("AGC_TPU_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield


