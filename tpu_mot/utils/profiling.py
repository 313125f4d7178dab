"""Tracing / profiling utilities (SURVEY.md §5 row "Tracing / profiling").

The reference's only instrumentation is ad-hoc FPS timers in the demo
loop; here:

  * `trace()` wraps a block in a jax.profiler trace (Perfetto/XProf
    readable — the tool used to find every hot spot in this repo's
    commit history).
  * `DeviceTimer` gives block_until_ready-bracketed wall timing.
  * `summarize_trace()` aggregates a captured trace by op, host-side,
    for quick terminal triage without TensorBoard.
  * `fps_meter()` is the demo-loop FPS counter, structured.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block: `with trace("/tmp/trace"): ...`"""
    with jax.profiler.trace(log_dir):
        yield


class DeviceTimer:
    """Wall timer that waits for device completion.

    >>> with DeviceTimer() as t:
    ...     out = step(...)
    ...     t.observe(out)
    >>> t.elapsed
    """

    def __enter__(self):
        self._out = None
        self.t0 = time.perf_counter()
        return self

    def observe(self, out):
        self._out = out

    def __exit__(self, *exc):
        if self._out is not None:
            jax.block_until_ready(self._out)
        self.elapsed = time.perf_counter() - self.t0
        return False


def summarize_trace(log_dir: str, top: int = 15):
    """Aggregate device op durations from a jax.profiler trace directory.

    Returns [(op_name, total_ms, count)] sorted by total time.
    """
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    agg: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        if name.startswith("$") or "profiler" in name:
            continue
        agg[name] += e.get("dur", 0)
        cnt[name] += 1
    return [(name, dur / 1e3, cnt[name])
            for name, dur in agg.most_common(top)]


class FpsMeter:
    """Structured frame-rate/latency counter for serving loops."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: collections.deque = collections.deque(maxlen=window)
        self.n_frames = 0

    def tick(self, n: int = 1):
        self.times.append((time.perf_counter(), n))
        self.n_frames += n

    @property
    def fps(self) -> float:
        if len(self.times) < 2:
            return 0.0
        (t0, _), (t1, _) = self.times[0], self.times[-1]
        frames = sum(n for _, n in list(self.times)[1:])
        return frames / max(t1 - t0, 1e-9)

    def stats(self) -> dict:
        return {"fps": round(self.fps, 1), "frames": self.n_frames}
