"""Timing, progress, and device profiling.

Upgrades the reference's print-based timer (depth_map_tools.py:13-18) and
per-frame ETA lines (stereo_rerender.py:474-487) into structured,
reusable helpers, plus first-class jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time


@contextlib.contextmanager
def timer(name="task", out=None):
    """``with timer('stage'):`` — prints elapsed wall time on exit; if
    ``out`` (a dict) is given, also records it under ``name``."""
    start = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - start
        if out is not None:
            out[name] = out.get(name, 0.0) + dt
        print(f"{name} took: {dt:.4f} s")


class Progress:
    """Per-frame progress with percent, ETA and last-batch latency
    (the reference's live progress line, batched)."""

    def __init__(self, total, label="frame", stream=sys.stdout):
        self.total = total
        self.done = 0
        self.label = label
        self.start = time.perf_counter()
        self.last = self.start
        self.stream = stream

    def step(self, n=1):
        self.done += n
        now = time.perf_counter()
        pct = 100.0 * self.done / self.total if self.total else 0.0
        avg = (now - self.start) / max(self.done, 1)
        rem = avg * max(self.total - self.done, 0)
        self.stream.write(
            f"[{pct:5.1f}%] {self.label} {self.done}/{self.total} | "
            f"eta {int(rem) // 60}m{int(rem) % 60:02d}s | "
            f"last batch {now - self.last:6.3f}s ({n / max(now - self.last, 1e-9):.2f}/s)\r")
        self.stream.flush()
        self.last = now

    def close(self):
        dt = time.perf_counter() - self.start
        self.stream.write(
            f"\n{self.done} {self.label}s in {dt:.2f}s "
            f"({self.done / max(dt, 1e-9):.2f}/s)\n")


class StageMetrics:
    """Accumulates per-stage frames/sec and writes a JSON report —
    the structured observability the reference lacks (SURVEY.md §5)."""

    def __init__(self):
        self.stages = {}

    def record(self, stage, frames, seconds):
        s = self.stages.setdefault(stage, {"frames": 0, "seconds": 0.0})
        s["frames"] += frames
        s["seconds"] += seconds

    def report(self):
        return {k: {**v, "fps": v["frames"] / max(v["seconds"], 1e-9)}
                for k, v in self.stages.items()}

    def dump(self, path):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def device_trace(log_dir=None):
    """Capture a jax.profiler trace around a block (view in TensorBoard /
    xprof). No-op if log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
