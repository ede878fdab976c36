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
