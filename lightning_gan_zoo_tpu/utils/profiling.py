"""Profiling/tracing subsystem (the reference has none — SURVEY §5.1).

Two layers:
  * StepTimer: host-side wall-clock stats per superstep → images/sec
  * jax.profiler trace capture around a window of steps (cfg.profile),
    viewable in TensorBoard / Perfetto
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import numpy as np


class StepTimer:
    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self, images_per_step: int, skip_first: int = 1) -> dict:
        """Throughput stats, excluding warm-up/compile steps."""
        ts = np.asarray(self.times[skip_first:] or self.times)
        mean = float(ts.mean()) if len(ts) else float("nan")
        return {
            "steps": len(self.times),
            "mean_step_s": mean,
            "p50_step_s": float(np.median(ts)) if len(ts) else float("nan"),
            "images_per_sec": images_per_step / mean if mean > 0 else 0.0,
        }

    def reset(self):
        self.times.clear()


def _device_op_events(trace_dir: str | Path) -> list:
    """'XLA Ops'-lane complete events of the newest trace.json.gz under
    ``trace_dir`` (device pids only; excludes the 'XLA Modules'/'Steps'
    summary lanes, which would double-count every op)."""
    import glob
    import gzip
    import json

    files = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*trace.json.gz"), reverse=True)
    if not files:
        return []
    with gzip.open(files[0]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, name in pid_names.items()
                   if "TPU" in str(name) or "/device" in str(name)}
    tid_names = {(e.get("pid"), e.get("tid")):
                 e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    return [e for e in events
            if e.get("ph") == "X" and e.get("pid") in device_pids
            and tid_names.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]


def device_op_times(trace_dir: str | Path) -> dict[str, tuple[float, int]]:
    """Per-op device durations: {op_name: (total_us, count)}.

    NOTE: fusion events nest (a parent fusion overlaps its sub-ops), so the
    SUM over ops exceeds wall device time — use these for relative shares
    and device_time_ms() for the honest total.

    Shared by tools/profile_superstep.py (the per-op profile loop) and
    bench.py (driver-captured device_ms_per_superstep / MFU rows)."""
    out: dict[str, tuple[float, int]] = {}
    for e in _device_op_events(trace_dir):
        name = e.get("name", "?")
        dur, cnt = out.get(name, (0.0, 0))
        out[name] = (dur + float(e.get("dur", 0.0)), cnt + 1)
    return out


def device_time_ms(trace_dir: str | Path) -> float:
    """Device busy time (ms) in the newest trace under dir: the union of
    the op-lane event intervals (op events nest inside fusion parents, so a
    plain sum would double-count ~2×)."""
    spans = sorted((float(e["ts"]), float(e["ts"]) + float(e.get("dur", 0.0)))
                   for e in _device_op_events(trace_dir))
    total = 0.0
    cur_s, cur_e = None, -1.0
    for s, t in spans:
        if cur_s is None or s > cur_e:
            if cur_s is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    if cur_s is not None:
        total += cur_e - cur_s
    return total / 1e3


class TraceCapture:
    """jax.profiler trace over the first N post-warmup supersteps."""

    def __init__(self, out_dir: str | Path, enabled: bool = False,
                 warmup_steps: int = 2, trace_steps: int = 5):
        self.out_dir = str(out_dir)
        self.enabled = enabled
        self.warmup = warmup_steps
        self.span = trace_steps
        self._step = 0
        self._active = False

    def tick(self):
        if not self.enabled:
            return
        import jax
        if self._step == self.warmup:
            Path(self.out_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.out_dir)
            self._active = True
        elif self._active and self._step == self.warmup + self.span:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[profile] trace written to {self.out_dir}")
        self._step += 1

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
