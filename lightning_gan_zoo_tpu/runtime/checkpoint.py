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


def _is_main() -> bool:
    return jax.process_index() == 0


def _barrier(name: str):
    """Cross-process sync around our own fs mutations (orbax coordinates
    ITS writes internally, but retention rmtree and train_meta.json are
    this class's responsibility). No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"lgzt_ckpt_{name}")


class CheckpointManager:
    def __init__(self, ckpt_dir: Optional[str | Path],
                 save_ckpts: bool = True, async_save: bool = False):
        """``ckpt_dir=None`` builds a restore-only manager (``save_ckpts``
        is forced off); saving requires a directory.

        ``async_save=True`` (cfg ``save_ckpts_async``) commits checkpoints
        in a background thread: ``save_best`` returns as soon as the state
        is snapshot off the device buffers (safe w.r.t. donated superstep
        buffers — orbax blocks until device memory is copied out) and the
        serialisation/fsync overlaps the next training epochs. The deferred
        ``train_meta.json`` is written when the commit lands (next save or
        :meth:`finalize`). Standard large-scale-TPU practice; the reference
        has no counterpart (PL ModelCheckpoint saves synchronously)."""
        if ckpt_dir is None:
            save_ckpts = False
        self.dir = Path(ckpt_dir) if ckpt_dir is not None else None
        self.save_ckpts = save_ckpts
        self.async_save = bool(async_save)
        self._ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                       if self.async_save else ocp.StandardCheckpointer())
        # restores always go through the synchronous convenience API (the
        # async wrapper's restore signature differs)
        self._restorer = (ocp.StandardCheckpointer() if self.async_save
                          else self._ckptr)
        self._pending_meta: Optional[Tuple[Path, dict]] = None
        self._pending_cleanup: list[Path] = []
        if save_ckpts:
            if _is_main():
                self.dir.mkdir(parents=True, exist_ok=True)
            _barrier("mkdir")

    # -- save ---------------------------------------------------------------
    def _flush_pending(self):
        """Block until an in-flight async commit lands, then write its
        deferred metadata (the checkpoint dir only exists post-commit) and
        only THEN delete the checkpoint it superseded — a crash anywhere in
        the async window must always leave one restorable checkpoint."""
        self._ckptr.wait_until_finished()
        if self._pending_meta is not None:
            path, info = self._pending_meta
            self._pending_meta = None
            if _is_main():
                (path / "train_meta.json").write_text(json.dumps(info))
            _barrier("pending_meta")
        if self._pending_cleanup:
            olds, self._pending_cleanup = self._pending_cleanup, []
            if _is_main():
                for old in olds:
                    shutil.rmtree(old, ignore_errors=True)
            _barrier("retention")

    def save_best(self, state, *, epoch: int, fid: Optional[float],
                  meta: Optional[dict] = None):
        """Keep exactly one best checkpoint, named like the reference's
        model_best-{fid:.2f}."""
        if not self.save_ckpts:
            return
        # serialise saves: the previous commit must land before its
        # directory can be considered for retention cleanup
        self._flush_pending()
        tag = f"model_best-{fid:.2f}" if fid is not None else \
            f"model_epoch-{epoch}"
        path = (self.dir / tag).absolute()
        # SAVE-THEN-DELETE: superseded checkpoints are removed only after
        # the replacement is fully committed (+ its meta written), so a hard
        # crash (OOM/SIGKILL — no rescue fires) at any point leaves at least
        # one restorable checkpoint. Only a same-tag collision (identical
        # fid) must be cleared pre-save — orbax refuses to overwrite.
        # Retention fs mutations are process-0-only (orbax's save below is a
        # COLLECTIVE — every process calls it; orbax writes from the primary
        # and barriers internally).
        olds = [old.absolute() for old in self.dir.glob("model_*")
                if old.absolute() != path
                and ".orbax-checkpoint-tmp" not in old.name
                # never garbage-collect a NEWER-epoch checkpoint: the
                # experiment-level rescue dir is shared by every run of the
                # same name, so a run preempted early must not delete a
                # concurrent (or later) run's more-advanced rescue —
                # select_resume's epoch arbitration then keeps the newest
                # state winning, as documented
                and CheckpointManager.ckpt_epoch(old) <= epoch]
        if _is_main() and path.exists():
            shutil.rmtree(path)
        _barrier("pre_save")
        info = {"epoch": epoch, "fid": fid, **(meta or {})}
        if self.async_save:
            # hand orbax the live (possibly device) arrays: it snapshots
            # them before returning, then commits in the background
            self._ckptr.save(path, state)
            self._pending_meta = (path, info)
            self._pending_cleanup = olds
            return
        self._ckptr.save(path, jax.device_get(state))
        self._ckptr.wait_until_finished()
        if _is_main():
            (path / "train_meta.json").write_text(json.dumps(info))
        _barrier("meta")
        if _is_main():
            for old in olds:
                shutil.rmtree(old, ignore_errors=True)
        _barrier("retention")

    def finalize(self):
        """Block until any in-flight async save is fully committed (call at
        the end of training / before reading the checkpoint back)."""
        self._flush_pending()

    # -- restore ------------------------------------------------------------
    @staticmethod
    def find_ckpt(ckpt_dir: Optional[str | Path]) -> Optional[Path]:
        """Reference find_ckpt (run_network.py:19-23): scan for checkpoints.
        Orbax in-progress staging dirs (``*.orbax-checkpoint-tmp-*`` — left
        behind when a process dies mid-commit, a window async_save widens to
        whole epochs) are never resume candidates.

        Deviation from the reference's hard assert on multiples: retention
        is save-then-delete, so a crash between the new commit and the old
        cleanup legitimately leaves two checkpoints — arbitrate by recorded
        epoch (meta-less dirs rank last), then mtime, and resume from the
        newest instead of refusing to start."""
        if not ckpt_dir:
            return None
        d = Path(ckpt_dir)
        if not d.is_dir():
            return None
        ckpts = sorted(p for p in d.glob("model_*") if p.is_dir()
                       and ".orbax-checkpoint-tmp" not in p.name)
        if len(ckpts) <= 1:
            return ckpts[0] if ckpts else None
        return max(ckpts, key=lambda p: (CheckpointManager.ckpt_epoch(p),
                                         p.stat().st_mtime))

    @staticmethod
    def select_resume(ckpt_dir: Optional[str | Path],
                      extra_rescue_dirs=()) -> Optional[Path]:
        """Pick the resume source: the best-FID checkpoint in ``ckpt_dir``
        or the newest preemption rescue — whichever carries the newer epoch
        (ties go to the rescue: it was written after the same-epoch
        validation checkpoint). A stale rescue surviving from an earlier
        preemption that was already resumed and trained past must not roll
        training back.

        Rescue candidates (ADVICE r3): the configured dir's sibling
        ``<version>/ckpts_rescue`` (historical per-run location), the
        run-stable experiment-level ``<exp>/ckpts_rescue`` two levels up
        (where new rescues land — survives version-dir changes across
        requeues), and any ``extra_rescue_dirs`` the Trainer passes for the
        current run. An automated requeue re-running the same command thus
        resumes from the NEWEST rescue instead of livelocking on the
        original run's. With ``ckpt_dir`` unset nothing is scanned — a
        fresh run never silently resumes."""
        if not ckpt_dir:
            return None
        best = CheckpointManager.find_ckpt(ckpt_dir)
        candidates = [Path(ckpt_dir).parent / "ckpts_rescue",
                      Path(ckpt_dir).parent.parent / "ckpts_rescue",
                      *(Path(p) for p in extra_rescue_dirs)]
        rescues, seen = [], set()
        for d in candidates:
            d = d.absolute()
            if d in seen:
                continue
            seen.add(d)
            r = CheckpointManager.find_ckpt(d)
            if r is not None:
                rescues.append(r)
        if not rescues:
            return best
        rescue = max(rescues, key=lambda p: (
            CheckpointManager.ckpt_epoch(p), p.stat().st_mtime))
        if best is None or (CheckpointManager.ckpt_epoch(rescue) >=
                            CheckpointManager.ckpt_epoch(best)):
            return rescue
        return best

    @staticmethod
    def ckpt_epoch(path: Path) -> int:
        """Epoch recorded in a checkpoint's train_meta.json, -1 when the
        metadata is missing (e.g. a commit that died before the meta
        write) — used to arbitrate rescue-vs-best resume priority."""
        meta_path = Path(path) / "train_meta.json"
        if not meta_path.exists():
            return -1
        try:
            epoch = json.loads(meta_path.read_text()).get("epoch")
            return int(epoch) if epoch is not None else -1
        except (ValueError, TypeError, json.JSONDecodeError):
            return -1

    def restore(self, path: Path, target) -> Tuple[Any, dict]:
        self._flush_pending()
        state = self._restorer.restore(Path(path).absolute(), target=target)
        meta_path = Path(path) / "train_meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        return state, meta
