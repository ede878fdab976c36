"""The training loop — the Trainer replacement.

Orchestrates what PL's Trainer + callbacks do in the reference
(run_network.py:41-72): task/model instantiation, dataloaders (rebuilt each
epoch — reload_dataloaders_every_epoch semantics for π-GAN's variable batch
size), the jitted superstep over a device mesh, validation with Real/Fake
grids + FID/KID, figure callbacks, best-FID checkpointing, resume, resolution
annealing, gradient accumulation scheduling, and profiling.
"""
from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.node import Config
from ..config.registry import instantiate
from ..data.pipeline import EpochLoader
from ..figures.types import FigureContext
from ..figures.image_io import make_grid, unnormalise
from ..parallel import mesh as pmesh
from ..utils.logging import ExperimentLogger
from ..utils.profiling import StepTimer, TraceCapture
from .checkpoint import CheckpointManager
from .state import create_train_state
from .steps import (build_folded_superstep, build_superstep,
                    microbatch_count)


def _resolve_version(cfg: Config, output_root: Path) -> str:
    """Reference versioning: cluster job id or cfg.version, else next int
    (run_network.py:28-40)."""
    v = cfg.get("version")
    if v is not None:
        return str(v)
    for env in ("SLURM_JOB_ID", "SUBMITIT_JOB_ID"):
        if os.environ.get(env):
            return os.environ[env]
    base = output_root / cfg.name
    existing = [int(p.name.split("_")[-1]) for p in base.glob("version_*")
                if p.name.split("_")[-1].isdigit()] if base.is_dir() else []
    n = max(existing) + 1 if existing else 0
    if jax.process_count() > 1:
        # a process scanning after process 0 already created version_N
        # would pick N+1 — all processes must land in the SAME run dir
        from jax.experimental import multihost_utils
        import numpy as np
        n = int(multihost_utils.broadcast_one_to_all(np.int32(n)))
    return f"version_{n}"


def _dataset_kwargs(cfg: Config) -> dict:
    return dict(img_size=int(cfg.train.img_size),
                n_channels=int(cfg.train.channels_img),
                data_mean=float(cfg.train.data_mean),
                data_std=float(cfg.train.data_std))


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.seed = int(cfg.get("seed", 42))
        self.root_rng = jax.random.PRNGKey(self.seed)

        out_root = Path(cfg.get("output_root", "output"))
        self.version = _resolve_version(cfg, out_root)
        self.logging_dir = out_root / cfg.name / self.version
        self.logging_dir.mkdir(parents=True, exist_ok=True)
        # artifact/metric writes only on process 0 (rank_zero_only
        # equivalent, reference figures/types.py:61)
        self.logger = ExperimentLogger(self.logging_dir,
                                       enable_tb=pmesh.is_main_process())

        # task (the LightningModule stand-in)
        self.task = instantiate(cfg.model.lm, cfg, str(self.logging_dir))

        # device mesh (ICI data parallelism; reference: PL DDP over num_gpus;
        # num_sp>1 adds the ray-sharding axis for the NeRF families,
        # num_tp>1 the tensor-parallel axis for the conv families)
        n_dev = int(cfg.get("num_gpus", 1) or 1)
        num_tp = int(cfg.get("num_tp", 1) or 1)
        num_sp = int(cfg.get("num_sp", 1) or 1)
        if num_tp * num_sp > 1 and jax.process_count() > 1 and \
                len(jax.local_devices()) % (num_tp * num_sp):
            # the minor (sp, tp) mesh axes fold consecutive devices; when
            # their product divides the per-host device count every tp
            # group is host-local, so state gathers (checkpoint, rescue,
            # export) assemble from local shards with no collective and
            # per-process batch stripes stay distinct
            raise ValueError(
                f"num_tp={num_tp} x num_sp={num_sp} must divide the "
                f"{len(jax.local_devices())} local devices per process "
                "(tp groups must be host-local); scale across hosts via "
                "the 'data' axis")
        self.mesh = pmesh.make_mesh(min(n_dev, len(jax.devices())),
                                    sp=num_sp, tp=num_tp)
        self._tp_min_shard = int(cfg.get("tp_min_shard", 8) or 8)
        # ZeRO-1 (cfg.zero_opt): shard Adam moments over ('data','tp') —
        # per-chip optimizer memory divides by the data-axis size; the
        # update math runs sharded and GSPMD all-gathers only the updates.
        # FSDP / ZeRO-3 (cfg.fsdp): params + EMA shard the same way too
        # (implies zero_opt) — weights all-gather at use, grads
        # reduce-scatter; resident state per chip is 1/data of everything.
        multi = self.mesh.devices.size > 1
        self._fsdp = bool(cfg.get("fsdp", False)) and multi
        self._zero_opt = (bool(cfg.get("zero_opt", False)) and multi) \
            or self._fsdp

        # figures
        self.figures = self._build_figures()

        # checkpointing: new checkpoints land in THIS run's dir;
        # cfg.train.ckpt_dir is only scanned for resume (run_network.py:19-23)
        self.ckpt = CheckpointManager(
            self.logging_dir / "ckpts",
            save_ckpts=bool(cfg.get("save_ckpts", True)),
            async_save=bool(cfg.get("save_ckpts_async", False)))

        # FID/KID evaluator (on-device, lazy)
        self.metrics_eval = None
        if bool(cfg.get("calc_fid", False)) and bool(cfg.val.get("use_fid",
                                                                 True)):
            from ..eval.metrics_callback import InceptionMetrics
            self.metrics_eval = InceptionMetrics(
                cfg, self.task, logging_dir=str(self.logging_dir))

        self.timer = StepTimer()
        self.trace = TraceCapture(self.logging_dir / "trace",
                                  enabled=bool(cfg.get("profile", False)))

        self.epoch = 0
        self.best_fid = float("inf")
        self._fixed_noise = self.task.sample_z(
            jax.random.fold_in(self.root_rng, 7), 8)

        # dynamic (epoch-dependent) training shape knobs
        self.current_batch_size = int(self._initial_batch_size())
        self._active_fold = 1
        self._compiled = {}
        self._current_key = None
        self.state = None
        self.d_tx = self.g_tx = None

    # ------------------------------------------------------------------ setup
    def _build_figures(self) -> List[Any]:
        figs = []
        fig_nodes = self.cfg.get("figures") or {}
        monitor = ("fid" if self.cfg.figure_details.get("fid_callback", False)
                   else None)
        for name, node in fig_nodes.items():
            try:
                figs.append(instantiate(node, self.cfg.figure_details,
                                        str(self.logging_dir),
                                        monitor=monitor))
            except FileNotFoundError as e:
                # the one documented data-dependent skip: a figure whose
                # dataset isn't on disk (e.g. birds shape analyses)
                print(f"[figures] skipping {name} (missing data): {e}")
            # anything else (typo'd _target_, bad kwargs) must FAIL the run
            # rather than silently dropping the figure from training
        return figs

    def _initial_batch_size(self) -> int:
        if "variable_batch_size" in self.cfg:
            try:
                return int(self.cfg.variable_batch_size.batch_sizes[0])
            except Exception:
                pass
        return int(self.cfg.train.batch_size)

    def _ema_decay(self) -> float:
        """Opt-in G weight EMA (train.ema_decay, 0 = off). Eval/figures/FID
        then use the EMA twin (state.eval_g_params)."""
        return float(self.cfg.train.get("ema_decay", 0.0) or 0.0)

    def _rescue_dir(self) -> Path:
        """Run-stable preemption-rescue location: ``<output_root>/<name>/
        ckpts_rescue`` — shared by every version of the experiment so a
        requeue chain (each resolving a fresh version dir) always writes
        and finds ONE newest rescue. Concurrent runs under the same
        experiment name share it; the epoch arbitration in
        ``select_resume`` keeps the newest state winning."""
        return self.logging_dir.parent / "ckpts_rescue"

    def _accum_factor(self, epoch: Optional[int] = None) -> int:
        if epoch is None:
            epoch = self.epoch
        node = self.cfg.get("accumulate_grad_batches", 1)
        if isinstance(node, (int, float)):
            return max(int(node), 1)
        # epoch-scheduled {start_epoch, accumulation_factor}
        # (run_network.py:62-64, conf/machine/*.yaml)
        start = int(node.get("start_epoch", 0))
        factor = int(node.get("accumulation_factor", 1))
        return factor if epoch >= start else 1

    def _batch_size_at(self, epoch: int) -> int:
        """Global batch size in effect at ``epoch`` under the
        variable_batch_size schedule (static replay of
        _update_epoch_schedules' batch-size branch)."""
        bs = self._initial_batch_size()
        if "variable_batch_size" not in self.cfg:
            return bs
        ups = list(self.cfg.variable_batch_size.update_epochs)
        sizes = list(self.cfg.variable_batch_size.batch_sizes)
        for e, up in enumerate(ups):
            if up <= epoch and e + 1 < len(sizes):
                bs = int(sizes[e + 1])
        return bs

    def _epoch_superstep_table(self, dataset_len: int,
                               num_epochs: int) -> List[int]:
        """Exact supersteps-per-epoch for every training epoch, accounting
        for variable_batch_size, epoch-scheduled grad accumulation and the
        per-epoch fold clamp — mirrors _make_train_loader/EpochLoader
        arithmetic. Feeds the epoch-derived LR schedules so their
        count→epoch mapping stays exact across annealing boundaries
        (previously the horizon was frozen from the first epoch's loader)."""
        nproc = max(jax.process_count(), 1)
        per_host = dataset_len // nproc
        disc_freq = int(self.cfg.optimisation.disc_freq)
        gen_freq = int(self.cfg.optimisation.gen_freq)
        cfg_fold = self._fold()
        table = []
        for e in range(num_epochs):
            bs = self._batch_size_at(e)
            n_micro = microbatch_count(disc_freq, gen_freq,
                                       self._accum_factor(e))
            local_batch = max(bs // nproc, 1)
            span = local_batch * n_micro
            fold = min(cfg_fold, max(1, per_host // max(span, 1)))
            table.append((per_host // (span * fold)) * fold)
        return table

    def _update_epoch_schedules(self, replay: bool = False):
        """Variable batch size + resolution annealing at epoch boundaries
        (core/lightning_module.py:272-283, core/callback_train_res.py).
        ``replay=True`` fast-forwards static knobs after a resume WITHOUT
        touching the restored traced state (fade-in alpha lives in the
        checkpoint)."""
        cfg = self.cfg
        if "variable_batch_size" in cfg:
            ups = list(cfg.variable_batch_size.update_epochs)
            if self.epoch in ups:
                idx = ups.index(self.epoch) + 1
                sizes = list(cfg.variable_batch_size.batch_sizes)
                if idx < len(sizes):
                    self.current_batch_size = int(sizes[idx])
                    print(f"Batch size for this epoch: "
                          f"{self.current_batch_size}")
        if bool(cfg.get("use_resolution_annealing", False)):
            ra = cfg.resolution_annealing
            ups = list(ra.update_epochs)
            if self.epoch in ups:
                idx = ups.index(self.epoch) + 1
                res = list(ra.resolutions)
                if idx < len(res):
                    self.task.increase_resolution(int(res[idx]))
                    if self.state is not None and not replay:
                        self.state = self.state.replace(
                            extra=self.task.reset_alpha(self.state.extra))
                    print(f"Training resolution → {res[idx]}")

    def _fold(self) -> int:
        """train.fold_steps: scan K supersteps into one dispatch (dispatch
        amortisation; exact-math parity tested). 1 under fast_dev_run;
        _make_train_loader clamps it to what the dataset can fill
        (self._active_fold is the value actually in effect)."""
        if bool(self.cfg.debug.get("fast_dev_run", False)):
            return 1
        return max(1, int(self.cfg.train.get("fold_steps") or 1))

    def _make_train_loader(self) -> EpochLoader:
        ds = instantiate(self.cfg.dataset.train, **_dataset_kwargs(self.cfg))
        disc_freq = int(self.cfg.optimisation.disc_freq)
        gen_freq = int(self.cfg.optimisation.gen_freq)
        n_micro = microbatch_count(disc_freq, gen_freq, self._accum_factor())
        # a fold span must fit the per-host epoch (tiny smoke datasets);
        # batch_size is GLOBAL, each host holds batch/process_count of it
        nproc = max(jax.process_count(), 1)
        per_host = len(ds) // nproc
        local_batch = max(self.current_batch_size // nproc, 1)
        max_fold = max(1, per_host // max(local_batch * n_micro, 1))
        self._active_fold = min(self._fold(), max_fold)
        return EpochLoader(ds, self.current_batch_size,
                           n_micro=n_micro * self._active_fold,
                           seed=self.seed,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())

    def _get_step_fn(self):
        """(Re)build + jit the superstep when shape-relevant knobs change."""
        key = (self.current_batch_size, self._accum_factor(),
               getattr(self.task, "training_resolution", None),
               self._active_fold)
        if key != self._current_key:
            disc_freq = int(self.cfg.optimisation.disc_freq)
            gen_freq = int(self.cfg.optimisation.gen_freq)
            raw = build_superstep(self.task, self.g_tx, self.d_tx,
                                  disc_freq, gen_freq, self._accum_factor(),
                                  ema_decay=self._ema_decay())
            fold = self._active_fold
            if fold > 1:
                raw = build_folded_superstep(raw, fold)
            state_sh = None
            if (pmesh.tp_size_of(self.mesh) > 1 or self._zero_opt) \
                    and self.state is not None:
                state_sh = pmesh.state_shardings(self.state, self.mesh,
                                                 self._tp_min_shard,
                                                 zero=self._zero_opt,
                                                 fsdp=self._fsdp)
            self._compiled[key] = pmesh.shard_superstep(raw, self.mesh,
                                                        folded=fold > 1,
                                                        state_sh=state_sh)
            self._current_key = key
        return self._compiled[key]

    # ---------------------------------------------------------------- init/resume
    def _init_state(self, steps_per_epoch: int,
                    epoch_supersteps: Optional[List[int]] = None):
        self.d_tx, self.g_tx = None, None
        d_tx, g_tx = self.task.configure_optimizers(
            steps_per_epoch, epoch_supersteps=epoch_supersteps)
        self.d_tx, self.g_tx = d_tx, g_tx
        g_vars, d_vars = self.task.init(jax.random.fold_in(self.root_rng, 0))
        state = create_train_state(g_vars, d_vars, g_tx, d_tx,
                                   extra=self.task.initial_extra(),
                                   ema=self._ema_decay() > 0)
        ckpt_dir = self.cfg.train.get("ckpt_dir")
        # best-FID checkpoint vs preemption rescue (run-stable
        # <exp>/ckpts_rescue written by the SIGTERM handler in fit, plus
        # the legacy <version>/ckpts_rescue sibling): whichever is newer.
        # The current run's own rescue dir is always a candidate so a
        # requeue chain keeps resuming from its newest rescue even when
        # train.ckpt_dir points at the original run (ADVICE r3).
        resume_path = CheckpointManager.select_resume(
            ckpt_dir, extra_rescue_dirs=[self._rescue_dir()])
        if resume_path is not None:
            print(f"Resuming from {resume_path}")
            state, meta = self.ckpt.restore(resume_path,
                                            jax.device_get(state))
            self.epoch = int(meta.get("epoch", 0)) + 1
            bf = meta.get("best_fid")
            if bf is None:          # explicit None checks: 0.0 is a real
                bf = meta.get("fid")  # (excellent) FID, not "unset"
            # calibrated and uncalibrated FID are different scales: if the
            # calibration status flipped between the saved run and this one
            # (weights dropped in / removed between requeues), the stored
            # threshold is meaningless — reset it instead of freezing (or
            # trivialising) best-FID selection. Older metas lack the flag;
            # there `fid` was only ever set when calibrated.
            cal_saved = meta.get("fid_calibrated")
            if cal_saved is None:
                cal_saved = meta.get("fid") is not None
            cal_now = self._fid_calibrated()
            if bf is not None and cal_now is not None \
                    and bool(cal_saved) != cal_now:
                print(f"[resume] FID calibration changed "
                      f"({cal_saved} → {cal_now}); resetting the best-FID "
                      f"selection threshold")
                bf = None
            self.best_fid = float(bf) if bf is not None else float("inf")
            # fast-forward epoch-scheduled knobs (resolution, batch size)
            # without resetting the restored progressive-growing alpha
            for e in range(self.epoch + 1):
                saved_epoch, self.epoch = self.epoch, e
                self._update_epoch_schedules(replay=True)
                self.epoch = saved_epoch
        self.state = pmesh.put_state(state, self.mesh,
                                     min_shard=self._tp_min_shard,
                                     zero=self._zero_opt, fsdp=self._fsdp)

    #: multi-host: agree on the preemption flag only every K superstep
    #: boundaries — the collective's host-blocking fetch would otherwise
    #: fence the dispatch pipeline every step. Exit is delayed by up to
    #: K supersteps, well inside any preemption grace period.
    _PREEMPT_SYNC_EVERY = 8

    def _sync_preempted(self, boundary: Optional[int] = None) -> bool:
        """Cross-process agreement on the preemption flag. Every process
        must call this at the same loop points (superstep boundaries and
        the epoch-end rescue check): at a sync boundary all processes run
        one collective OR and break — entering the collective rescue save
        — together. Off-cycle boundaries return False WITHOUT consulting
        the local flag (a process acting on its own flag alone would
        deadlock its peers). Single-process: just the local flag."""
        if jax.process_count() == 1:
            return self._preempted
        if boundary is not None and \
                (boundary + 1) % self._PREEMPT_SYNC_EVERY:
            return False
        self._preempted = pmesh.any_process_flag(self._preempted,
                                                 self.mesh)
        return self._preempted

    # ------------------------------------------------------------------- train
    def fit(self):
        fast_dev_run = bool(self.cfg.debug.get("fast_dev_run", False))
        num_epochs = 1 if fast_dev_run else int(self.cfg.train.num_epochs)

        # preemption-safe rescue: SIGTERM (TPU-VM preemption / SLURM kill)
        # and SIGUSR1 (SLURM's configurable pre-termination warning) set a
        # flag; the superstep loop drains the in-flight dispatch, saves the
        # CURRENT state to ckpts_rescue/ and exits cleanly. Resume prefers
        # the rescue over the best-FID checkpoint while it is the newest
        # state (reference counterpart: submitit requeue +
        # resume_from_checkpoint, run_network.py:61,71 — which can only
        # recover the last *validated* state). Multi-host: the flag is
        # per-process and signals land at different superstep boundaries on
        # different hosts, so every exit decision goes through a collective
        # OR (_sync_preempted) — a process breaking out alone would
        # deadlock its peers inside the next psum.
        import signal
        self._preempted = False

        def _on_term(signum, frame):
            print(f"[rescue] caught signal {signum}; will checkpoint and "
                  "exit at the next superstep boundary", flush=True)
            self._preempted = True

        _old_handlers = []
        for _sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                _old_handlers.append((_sig, signal.signal(_sig, _on_term)))
            except (ValueError, OSError):   # non-main thread etc.
                pass

        loader = self._make_train_loader()
        # epoch-based LR schedules count SUPERSTEPS per epoch; with
        # fold_steps > 1 the loader counts dispatches (fold supersteps each).
        # The per-epoch table keeps the count→epoch mapping exact across
        # batch-size-annealing / accumulation-schedule boundaries (the
        # reference's LambdaLR horizons are epoch-granular too,
        # lightning_module.py:254-265). Folding drops up to
        # fold·n_micro·batch−1 trailing images per epoch vs n_micro·batch−1
        # unfolded.
        steps_per_epoch = loader.steps_per_epoch() * self._active_fold
        self._init_state(steps_per_epoch,
                         epoch_supersteps=self._epoch_superstep_table(
                             len(loader.dataset), num_epochs))

        global_step = int(self.state.step)
        while self.epoch < num_epochs:
            self._update_epoch_schedules()
            loader = self._make_train_loader()
            step_fn = self._get_step_fn()
            epoch_metrics: Dict[str, list] = {}
            t_epoch = time.perf_counter()
            step_counter = int(self.state.step)
            micro_per_super = loader.n_micro
            fold = self._active_fold
            micro_per_sub = micro_per_super // fold

            def staged(it):
                """One-batch lookahead: stage the next batch while the
                current superstep runs (H2D overlaps compute). Multi-process
                runs assemble the global batch from per-process stripes
                (pmesh.put_batch). With fold_steps > 1 the loader's
                [fold·n_micro, ...] stack reshapes to [fold, n_micro, ...]."""
                prev = None
                for b in it:
                    if fold > 1:
                        b = jax.tree.map(
                            lambda x: x.reshape((fold, micro_per_sub)
                                                + x.shape[1:]), b)
                    b = pmesh.put_batch(b, self.mesh, folded=fold > 1)
                    if prev is not None:
                        yield prev
                    prev = b
                if prev is not None:
                    yield prev

            n_steps = 0
            for batch in staged(loader.epoch(self.epoch)):
                if fold > 1:
                    # per-superstep keys derive on device from (root, base) —
                    # identical to the unfolded loop's fold_in sequence
                    rng = (self.root_rng, jnp.int32(step_counter))
                else:
                    rng = jax.random.fold_in(self.root_rng, step_counter)
                # no per-step device sync: XLA pipelines supersteps; metrics
                # stay on device until the epoch ends (one transfer)
                self.state, metrics = step_fn(self.state, batch, rng)
                step_counter += micro_per_super
                n_steps += 1
                self.trace.tick()
                for k, v in metrics.items():
                    epoch_metrics.setdefault(f"train/{k}", []).append(v)
                if fast_dev_run or self._sync_preempted(n_steps - 1):
                    break

            global_step = int(self.state.step)  # fences the epoch's chain
            dt = time.perf_counter() - t_epoch
            means = {k: float(np.mean(jax.device_get(v)))
                     for k, v in epoch_metrics.items()}
            means["perf/images_per_sec"] = (
                self.current_batch_size * loader.n_micro * n_steps
                / max(dt, 1e-9))
            self.logger.log_scalars(means, global_step)
            loss_str = " ".join(f"{k.split('/')[-1]}={v:.4f}"
                                for k, v in means.items())
            print(f"epoch {self.epoch} [{dt:.1f}s] {loss_str}")

            if self._sync_preempted():
                # the interrupted epoch counts as completed (its remaining
                # batches are skipped on resume — same epoch-granular
                # approximation as the LR-schedule horizons above).
                # The rescue lands in the RUN-STABLE experiment-level dir
                # (not this version's) so a requeue that resolves a new
                # version keeps finding the newest rescue (ADVICE r3);
                # save_best's retention garbage-collects the superseded one.
                rescue = CheckpointManager(self._rescue_dir(),
                                           save_ckpts=True)
                rescue.save_best(pmesh.gather_tree(self.state),
                                 epoch=self.epoch, fid=None,
                                 meta={"rescue": True,
                                       "version": self.version,
                                       "best_fid": self.best_fid,
                                       "fid_calibrated":
                                           self._fid_calibrated()})
                print(f"[rescue] checkpointed epoch {self.epoch} "
                      f"(step {global_step}) to "
                      f"{self._rescue_dir()}; exiting")
                break

            if (self.epoch % int(self.cfg.val.get("every_n_epochs", 1)) == 0
                    or fast_dev_run):
                self.validate(global_step)

            self.epoch += 1
            if fast_dev_run:
                break
        for _sig, _h in _old_handlers:
            signal.signal(_sig, _h)
        self.ckpt.finalize()   # land any in-flight async checkpoint commit
        self.trace.close()
        self.logger.flush()

    # --------------------------------------------------------------- validate
    def evaluate(self):
        """``eval_only=true``: restore a trained state (``train.ckpt_dir``,
        same resume scan as training — rescue checkpoints preferred) and run
        ONE full validation pass — Real/Fake grids, FID/KID, every figure —
        with no training and no checkpoint writes. Returns the metric dict.

        The reference has no offline-evaluation entry point (its metrics
        exist only as fit-time callbacks, run_network.py:66-75); here the
        identical validation path is reachable from the CLI for a finished
        run."""
        self.ckpt.save_ckpts = False   # never write checkpoints in eval mode
        self._init_state(steps_per_epoch=1)
        global_step = int(self.state.step)
        if global_step == 0:
            print("[eval] no checkpoint restored (train.ckpt_dir unset or "
                  "empty) — evaluating the random initialisation")
        metrics = self.validate(global_step)
        self.trace.close()
        self.logger.flush()
        return metrics

    def validate(self, global_step: int):
        cfg = self.cfg
        rng = jax.random.fold_in(self.root_rng, 10_000 + self.epoch)
        metrics: Dict[str, float] = {}

        # Real/Fake grids (reference validation_epoch_end,
        # lightning_module.py:64-73)
        try:
            val_ds = instantiate(cfg.dataset.val, **_dataset_kwargs(cfg))
            real = val_ds.load(list(range(min(8, len(val_ds)))))["image"]
            self.logger.log_image(
                "Real", make_grid(unnormalise(real, cfg.train.data_mean,
                                              cfg.train.data_std), ncol=8),
                global_step)
        except FileNotFoundError as e:
            print(f"[val] no val dataset: {e}")
        # grid/figure generation inputs: single-process uses the live device
        # arrays; multi-process gathers them to host first, so the
        # process-0-gated figure draws are purely LOCAL computations — a
        # jit over global cross-process arrays would need every process to
        # participate in every draw, and its auto-sharded output could not
        # be fetched on one process under tp/fsdp
        if jax.process_count() > 1:
            eval_g_params, eval_g_state = pmesh.gather_tree(
                (self.state.eval_g_params, self.state.g_state))
        else:
            eval_g_params, eval_g_state = (self.state.eval_g_params,
                                           self.state.g_state)
        fake = np.asarray(self.task.generate(
            eval_g_params, eval_g_state, self._fixed_noise, rng=rng))
        self.logger.log_image(
            "Fake", make_grid(unnormalise(fake[..., :3],
                                          cfg.train.data_mean,
                                          cfg.train.data_std), ncol=8),
            global_step)

        # FID / KID (multi-process: host params → local computation on each
        # process, identical results, logged by process 0 only)
        if self.metrics_eval is not None:
            fid_kid = self.metrics_eval.compute(
                eval_g_params, eval_g_state, rng)
            # multi-host: the best-FID `improved` decision below gates a
            # COLLECTIVE save path — make process 0's values authoritative
            # so no cross-host FID divergence can desynchronise it
            fid_kid = pmesh.broadcast_metrics(fid_kid)
            metrics.update(fid_kid)
            self.logger.log_scalars(fid_kid, global_step)
            print("  " + " ".join(f"{k}={v:.3f}" for k, v in fid_kid.items()))

        # figures — improvement gating may use the uncalibrated FID (it is
        # self-consistent within a run), so alias it under the monitor key
        fig_metrics = dict(metrics)
        if "fid" not in fig_metrics and "fid_uncalibrated" in fig_metrics:
            fig_metrics["fid"] = fig_metrics["fid_uncalibrated"]
        ctx = FigureContext(task=self.task,
                            g_params=eval_g_params,
                            g_state=eval_g_state, cfg=cfg,
                            epoch=self.epoch, rng=rng)
        for fig in self.figures:
            try:
                fig.on_validation_end(ctx, fig_metrics)
            except NotImplementedError as e:
                print(f"[figures] {type(fig).__name__}: {e}")
            # mirror freshly drawn artifacts to TensorBoard (GIFs: middle
            # frame) alongside the PNG/GIF files
            art = getattr(fig, "last_artefact", None)
            if art is not None and \
                    getattr(fig, "last_drawn_epoch", None) == self.epoch:
                frame = art[len(art) // 2] if isinstance(art, list) else art
                self.logger.log_image(f"figures/{type(fig).__name__}",
                                      np.asarray(frame), global_step)

        # checkpoint (best-FID policy). Without calibration weights the
        # SELECTION runs on fid_uncalibrated — measured directionally
        # valid on a clean real-acts cache (digits evidence run: 947 at
        # init → 95.6 → ~66 as samples visibly improve; an earlier
        # apparent inversion was the unkeyed cache mixing resolutions,
        # fixed in metrics_callback._cache_path). An uncalibrated value
        # never NAMES a checkpoint (save_best falls back to
        # model_epoch-N), so a fid-named checkpoint always means real
        # weights were present; calc_fid=false keeps latest like the
        # reference with monitoring off.
        fid = metrics.get("fid")
        fid_sel = fid if fid is not None else metrics.get("fid_uncalibrated")
        improved = fid_sel is None or fid_sel < self.best_fid
        if fid_sel is not None and fid_sel < self.best_fid:
            self.best_fid = fid_sel
        if improved and self.ckpt.save_ckpts:
            # async mode hands orbax the live arrays (it snapshots them off
            # the device before returning; the commit overlaps training);
            # the save_ckpts guard keeps the full-state host gather from
            # running just to be discarded by save_best's no-op path
            # best_fid in meta keeps the (possibly uncalibrated) selection
            # threshold across a resume; `fid` stays None when uncalibrated
            # so the checkpoint NAME never implies calibration
            self.ckpt.save_best(
                self.state if self.ckpt.async_save
                else pmesh.gather_tree(self.state),
                epoch=self.epoch, fid=fid,
                meta={"best_fid": (self.best_fid
                                   if self.best_fid != float("inf")
                                   else None),
                      "fid_calibrated": self._fid_calibrated()})
        return metrics

    def _fid_calibrated(self):
        """True/False when a FID evaluator exists, None otherwise —
        recorded in checkpoint meta so a resume can detect that the
        calibration status flipped between runs (calibrated and
        uncalibrated FID live on different scales; comparing a stored
        threshold across the flip would freeze or trivialise best-FID
        selection)."""
        if self.metrics_eval is None:
            return None
        cal = getattr(self.metrics_eval, "calibrated", None)
        return None if cal is None else bool(cal)


def _print_shapes(task):
    """debug.verbose_shape: per-layer shape table (the VerboseShapeExecution
    hook equivalent, reference core/utils/utils.py:13-27)."""
    import jax
    from flax import linen as nn
    z = task.sample_z(jax.random.PRNGKey(0), 2)
    kw = {}
    if hasattr(task, "training_resolution"):
        kw["sample_res"] = task.training_resolution
    print(nn.tabulate(task.generator,
                      {"params": jax.random.PRNGKey(0),
                       **task.model_rngs(jax.random.PRNGKey(1))},
                      depth=2)(z, train=False, **kw))


def train(cfg: Config):
    trainer = Trainer(cfg)
    if bool(cfg.debug.get("verbose_shape", False)):
        try:
            _print_shapes(trainer.task)
        except Exception as e:
            print(f"[debug] verbose_shape failed: {e}")
    if bool(cfg.get("eval_only", False)):
        metrics = trainer.evaluate()
        if metrics:
            print("eval " + " ".join(f"{k}={v:.4f}"
                                     for k, v in sorted(metrics.items())))
        return trainer
    trainer.fit()
    return trainer
