"""Experiment logging: scalars + images to TensorBoard event files and CSV.

Replaces the reference's TestTubeLogger under ``output/<name>/<version>``
(run_network.py:36-40) and the Real/Fake image grids written each val epoch
(core/lightning_module.py:64-73). TensorBoard writing goes through
tf.summary when TensorFlow is importable; CSV always works.
"""
from __future__ import annotations

import csv
import os
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class ExperimentLogger:
    def __init__(self, logging_dir: str | Path, enable_tb: bool = True):
        self.dir = Path(logging_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._csv_path = self.dir / "metrics.csv"
        self._csv_fields: list[str] = []
        # CSV gated like TB: in multi-host runs every process would
        # read-modify-write the same metrics.csv on a shared filesystem
        self._enable_csv = enable_tb
        self._tb = None
        if enable_tb:
            try:
                import tensorflow as tf  # noqa: F401  (baked into the image)
                self._tb = tf.summary.create_file_writer(
                    str(self.dir / "tb"))
            except Exception:
                self._tb = None

    # -- scalars ------------------------------------------------------------
    def log_scalars(self, metrics: Dict[str, float], step: int):
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default(step=step):
                for k, v in metrics.items():
                    tf.summary.scalar(k, v)
        self._append_csv(metrics, step)

    def _append_csv(self, metrics: Dict[str, float], step: int):
        if not self._enable_csv:
            return
        row = {"step": step, "time": time.time(), **metrics}
        fields = sorted(set(self._csv_fields) | set(row))
        rewrite = fields != self._csv_fields and self._csv_path.exists()
        if rewrite:
            with open(self._csv_path) as f:
                old = list(csv.DictReader(f))
        else:
            old = []
        mode = "w" if (rewrite or not self._csv_path.exists()) else "a"
        with open(self._csv_path, mode, newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            if mode == "w":
                w.writeheader()
                for r in old:
                    w.writerow(r)
            w.writerow(row)
        self._csv_fields = fields

    # -- images -------------------------------------------------------------
    def log_image(self, name: str, image_hwc: np.ndarray, step: int):
        """image in [0,1], HWC float."""
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default(step=step):
                tf.summary.image(name, image_hwc[None].astype(np.float32))

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
