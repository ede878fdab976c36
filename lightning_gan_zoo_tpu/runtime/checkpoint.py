"""Checkpoint save/restore with best-FID retention (orbax).

Replaces PL's ModelCheckpoint(monitor='fid', filename='model_best-{fid:.2f}')
+ resume_from_checkpoint (reference run_network.py:19-23,48-50,61,71). A
checkpoint captures the full TrainState (G/D params, both optimizer states,
mutable collections, step counters, progressive-growing extras) plus host
metadata (epoch, best fid, fixed eval noise) — everything needed for
requeue-and-resume fault tolerance (SURVEY §5.3/5.4).
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: Optional[str | Path],
                 save_ckpts: bool = True):
        """``ckpt_dir=None`` builds a restore-only manager (``save_ckpts``
        is forced off); saving requires a directory."""
        if ckpt_dir is None:
            save_ckpts = False
        self.dir = Path(ckpt_dir) if ckpt_dir is not None else None
        self.save_ckpts = save_ckpts
        self._ckptr = ocp.StandardCheckpointer()
        if save_ckpts:
            self.dir.mkdir(parents=True, exist_ok=True)

    # -- save ---------------------------------------------------------------
    def save_best(self, state, *, epoch: int, fid: Optional[float],
                  meta: Optional[dict] = None):
        """Keep exactly one best checkpoint, named like the reference's
        model_best-{fid:.2f}."""
        if not self.save_ckpts:
            return
        tag = f"model_best-{fid:.2f}" if fid is not None else \
            f"model_epoch-{epoch}"
        path = (self.dir / tag).absolute()
        for old in self.dir.glob("model_*"):
            if old.absolute() != path:
                shutil.rmtree(old, ignore_errors=True)
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path, jax.device_get(state))
        self._ckptr.wait_until_finished()
        info = {"epoch": epoch, "fid": fid, **(meta or {})}
        (path / "train_meta.json").write_text(json.dumps(info))

    # -- restore ------------------------------------------------------------
    @staticmethod
    def find_ckpt(ckpt_dir: Optional[str | Path]) -> Optional[Path]:
        """Reference find_ckpt (run_network.py:19-23): scan for checkpoints,
        assert at most one."""
        if not ckpt_dir:
            return None
        d = Path(ckpt_dir)
        if not d.is_dir():
            return None
        ckpts = sorted(p for p in d.glob("model_*") if p.is_dir())
        assert len(ckpts) <= 1, \
            f"Multiple checkpoints in {d}: {[c.name for c in ckpts]}"
        return ckpts[0] if ckpts else None

    def restore(self, path: Path, target) -> Tuple[Any, dict]:
        state = self._ckptr.restore(Path(path).absolute(), target=target)
        meta_path = Path(path) / "train_meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        return state, meta
