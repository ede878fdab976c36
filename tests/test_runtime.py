"""Runtime unit tests: version resolution, accumulation scheduling, optimizer
builders, checkpoint find/save semantics, compose edge cases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.config import compose, ComposeError
from lightning_gan_zoo_tpu.config.node import Config
from lightning_gan_zoo_tpu.runtime import optim as O
from lightning_gan_zoo_tpu.runtime.checkpoint import CheckpointManager
from lightning_gan_zoo_tpu.runtime.loop import Trainer, _resolve_version


def test_version_resolution_increments(tmp_path, monkeypatch):
    monkeypatch.delenv("SLURM_JOB_ID", raising=False)
    monkeypatch.delenv("SUBMITIT_JOB_ID", raising=False)
    cfg = Config({"name": "x", "version": None})
    assert _resolve_version(cfg, tmp_path) == "version_0"
    (tmp_path / "x" / "version_0").mkdir(parents=True)
    (tmp_path / "x" / "version_3").mkdir()
    assert _resolve_version(cfg, tmp_path) == "version_4"
    cfg2 = Config({"name": "x", "version": "abc"})
    assert _resolve_version(cfg2, tmp_path) == "abc"


def test_version_from_slurm_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SLURM_JOB_ID", "12345")
    cfg = Config({"name": "x", "version": None})
    assert _resolve_version(cfg, tmp_path) == "12345"


def test_accum_factor_schedule(tmp_path):
    """Epoch-scheduled accumulation {start_epoch, accumulation_factor}
    (reference run_network.py:62-64)."""
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                             "train.img_size=16", "train.features_gen=8",
                             "train.features_disc=8", "model.noise_dim=16",
                             "calc_fid=False", "save_ckpts=False",
                             "precision=32",
                             f"output_root={tmp_path}", "version=t",
                             "accumulate_grad_batches.start_epoch=5",
                             "accumulate_grad_batches.accumulation_factor=4"])
    tr = Trainer(cfg)
    tr.epoch = 0
    assert tr._accum_factor() == 1
    tr.epoch = 5
    assert tr._accum_factor() == 4


def test_optimizer_builders_match_torch_defaults():
    adam = O.build_optimizer(Config({"_target_": "torch.optim.Adam",
                                     "lr": 1e-3, "betas": [0.5, 0.9]}))
    rms = O.build_optimizer(Config({"_target_": "torch.optim.RMSprop",
                                    "lr": 1e-4}))
    p = {"w": jnp.ones((3,))}
    g = {"w": jnp.ones((3,))}
    for tx in (adam, rms):
        state = tx.init(p)
        upd, _ = tx.update(g, state, p)
        assert np.isfinite(np.asarray(upd["w"])).all()


def test_pigan_decay_schedule_endpoints():
    sched = O.pigan_decay_schedule(4e-4, 1e-4, span=100)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(0.25)
    assert float(sched(1000)) == pytest.approx(0.25)


def test_hologan_schedule_ramp():
    sched = O.hologan_schedule(total_epochs=10, steps_per_epoch=2)
    assert float(sched(0)) == 1.0          # epoch 0
    assert float(sched(10)) == 1.0         # epoch 5 == half
    assert float(sched(16)) == pytest.approx(0.4)  # epoch 8
    assert float(sched(20)) == 0.0         # epoch 10


def test_hologan_schedule_per_optimizer_freq():
    """An optimizer running ``freq`` updates per superstep (HoloGAN's G:
    gen_freq=2) must see the SAME epoch ramp as a freq-1 optimizer — its
    optax count just advances twice as fast (lightning_module.py:84-87
    frequency dicts; the ramp itself is core/utils/hologan.py:3-9)."""
    base = O.hologan_schedule(total_epochs=10, steps_per_epoch=2)
    twice = O.hologan_schedule(total_epochs=10, steps_per_epoch=2,
                               updates_per_superstep=2)
    for count in (0, 10, 16, 20):
        assert float(twice(2 * count)) == pytest.approx(float(base(count)))


def test_epoch_from_count_variable_table():
    """count→epoch with a non-constant supersteps-per-epoch table (batch-size
    annealing changes the horizon mid-run)."""
    fn = O.make_epoch_from_count(steps_per_epoch=4,
                                 epoch_supersteps=[4, 4, 2, 2])
    expected = [0] * 4 + [1] * 4 + [2] * 2 + [3] * 2
    for count, e in enumerate(expected):
        assert int(fn(count)) == e
    assert int(fn(12)) == 4  # past the end of training
    # per-optimizer frequency scales every boundary
    fn3 = O.make_epoch_from_count(steps_per_epoch=4,
                                  epoch_supersteps=[4, 4, 2, 2],
                                  updates_per_superstep=3)
    for count, e in enumerate(expected):
        assert int(fn3(3 * count)) == e
    # constant table degrades to the plain division form
    fnc = O.make_epoch_from_count(steps_per_epoch=99,
                                  epoch_supersteps=[4, 4, 4])
    assert int(fnc(7)) == 1 and int(fnc(8)) == 2


def test_epoch_superstep_table_matches_loaders(tmp_path):
    """Trainer._epoch_superstep_table must reproduce exactly what the real
    per-epoch loaders yield across a variable_batch_size boundary."""
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                             "train.img_size=16", "train.features_gen=8",
                             "train.features_disc=8", "model.noise_dim=16",
                             "calc_fid=False", "save_ckpts=False",
                             "precision=32", "train.num_epochs=4",
                             "train.fold_steps=2",
                             "variable_batch_size.update_epochs=[2,1000]",
                             "variable_batch_size.batch_sizes=[4,8,8]",
                             f"output_root={tmp_path}", "version=t"])
    tr = Trainer(cfg)
    loader0 = tr._make_train_loader()
    table = tr._epoch_superstep_table(len(loader0.dataset), 4)
    actual = []
    for e in range(4):
        tr.epoch = e
        tr._update_epoch_schedules(replay=True)
        loader = tr._make_train_loader()
        actual.append(loader.steps_per_epoch() * tr._active_fold)
    assert table == actual
    assert len(set(table)) > 1  # the boundary actually changed the horizon


def test_find_ckpt_arbitrates_multiple_by_epoch(tmp_path):
    # Save-then-delete retention means a crash between the new commit and
    # the old cleanup leaves two checkpoints; the newer epoch wins.
    import json
    a = tmp_path / "model_best-1.00"
    b = tmp_path / "model_best-2.00"
    a.mkdir()
    b.mkdir()
    (a / "train_meta.json").write_text(json.dumps({"epoch": 7}))
    (b / "train_meta.json").write_text(json.dumps({"epoch": 3}))
    assert CheckpointManager.find_ckpt(tmp_path) == a


def test_find_ckpt_prefers_committed_meta_over_metaless(tmp_path):
    # A crash after commit but before the meta write leaves the NEW dir
    # without train_meta.json — resume must fall back to the old (complete)
    # checkpoint, not the half-finalised new one.
    import json
    old = tmp_path / "model_best-5.00"
    new = tmp_path / "model_best-4.00"
    old.mkdir()
    new.mkdir()
    (old / "train_meta.json").write_text(json.dumps({"epoch": 2}))
    assert CheckpointManager.find_ckpt(tmp_path) == old


def test_find_ckpt_none_and_single(tmp_path):
    assert CheckpointManager.find_ckpt(tmp_path) is None
    (tmp_path / "model_best-1.00").mkdir()
    assert CheckpointManager.find_ckpt(tmp_path).name == "model_best-1.00"


def test_best_fid_retention(tmp_path):
    mgr = CheckpointManager(tmp_path, save_ckpts=True)
    state = {"w": jnp.ones((2,))}
    mgr.save_best(state, epoch=0, fid=12.3456)
    assert (tmp_path / "model_best-12.35").exists()
    mgr.save_best(state, epoch=1, fid=8.1)
    assert (tmp_path / "model_best-8.10").exists()
    assert not (tmp_path / "model_best-12.35").exists()  # old best pruned


def test_async_checkpoint_roundtrip_and_retention(tmp_path):
    """save_ckpts_async: the background commit must land (finalize), write
    the deferred train_meta.json, survive retention across saves, and
    restore bit-identically — including from live jax arrays."""
    import json

    mgr = CheckpointManager(tmp_path, save_ckpts=True, async_save=True)
    state = {"w": jnp.arange(4, dtype=jnp.float32),
             "b": jnp.ones((2, 3), jnp.bfloat16)}
    mgr.save_best(state, epoch=0, fid=12.3456)   # returns pre-commit
    mgr.save_best(state, epoch=1, fid=8.1)       # flushes the first commit
    mgr.finalize()
    assert (tmp_path / "model_best-8.10").exists()
    assert not (tmp_path / "model_best-12.35").exists()
    meta = json.loads(
        (tmp_path / "model_best-8.10" / "train_meta.json").read_text())
    assert meta["epoch"] == 1 and abs(meta["fid"] - 8.1) < 1e-9

    restored, meta2 = mgr.restore(
        tmp_path / "model_best-8.10",
        target={"w": jnp.zeros(4, jnp.float32),
                "b": jnp.zeros((2, 3), jnp.bfloat16)})
    assert meta2["epoch"] == 1
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored["b"], np.float32),
        np.asarray(state["b"], np.float32))


def test_save_then_delete_keeps_old_best_until_new_commit_lands(tmp_path):
    """Crash-safety ordering (ADVICE r3): the superseded best checkpoint may
    only disappear AFTER the replacement is committed and its meta written —
    a hard kill mid-save must always leave one restorable checkpoint."""
    mgr = CheckpointManager(tmp_path, save_ckpts=True, async_save=True)
    state = {"w": jnp.ones((2,))}
    mgr.save_best(state, epoch=0, fid=12.35)
    mgr.finalize()
    assert (tmp_path / "model_best-12.35").exists()
    # second save returns pre-commit: the old best must still be on disk
    mgr.save_best(state, epoch=1, fid=8.1)
    assert (tmp_path / "model_best-12.35").exists(), \
        "old best deleted before the new commit landed"
    # even with both present (the crash window), resume picks the newer epoch
    # once meta exists, or the committed one while the new meta is pending
    found_mid = CheckpointManager.find_ckpt(tmp_path)
    assert found_mid is not None
    mgr.finalize()
    assert not (tmp_path / "model_best-12.35").exists()
    assert (tmp_path / "model_best-8.10").exists()


def test_best_selection_runs_on_uncalibrated_fid(tmp_path):
    """Without calibration weights, checkpoint SELECTION keeps the
    best-by-fid_uncalibrated epoch (measured directionally valid on a
    clean real-acts cache — see runtime/loop.validate), while checkpoint
    NAMES never carry an uncalibrated value (model_epoch-N)."""
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                             "train.img_size=16", "train.features_gen=8",
                             "train.features_disc=8", "model.noise_dim=16",
                             "train.batch_size=4", "dataset.n=16",
                             "calc_fid=False", "save_ckpts=True",
                             "precision=32", "figure_details.fid_callback=False",
                             "~figures",
                             f"output_root={tmp_path}", "version=t"])
    tr = Trainer(cfg)
    tr._init_state(steps_per_epoch=1)

    class _Stub:
        def __init__(self):
            self.vals = iter([50.0, 20.0, 35.0])

        def compute(self, g_params, g_state, rng):
            return {"fid_uncalibrated": next(self.vals)}
    tr.metrics_eval = _Stub()

    for epoch in range(3):
        tr.epoch = epoch
        tr.validate(global_step=epoch)
    ckpts = list((tr.logging_dir / "ckpts").glob("model_*"))
    assert len(ckpts) == 1
    assert ckpts[0].name == "model_epoch-1"       # the fid=20 epoch won
    import json as _json
    meta = _json.loads((ckpts[0] / "train_meta.json").read_text())
    assert meta["epoch"] == 1 and meta["fid"] is None
    assert meta["best_fid"] == 20.0               # threshold survives resume
    assert tr.best_fid == 20.0


def test_compose_unknown_group_choice_error():
    with pytest.raises(ComposeError):
        compose(CONF_DIR, ["dataset=not_a_dataset"])


def test_compose_group_replace_drops_stale_keys():
    cfg = compose(CONF_DIR, ["+expt=anigan", "machine=local",
                             "deformer=displacement"])
    assert "DisplacementDeformer" in cfg.deformer._target_
    assert "lambda_" not in cfg.deformer  # stale TPS key must not survive


def test_figure_config_typo_fails_run(tmp_path):
    """A misspelled figure _target_ must raise at Trainer construction, not
    be silently dropped from the run."""
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                             "train.img_size=16", "train.features_gen=8",
                             "train.features_disc=8", "model.noise_dim=16",
                             "calc_fid=False", "save_ckpts=False",
                             "precision=32",
                             f"output_root={tmp_path}", "version=t"])
    cfg.figures["bogus"] = Config(
        {"_target_": "core.figures.types.NoSuchFigure"})
    with pytest.raises(Exception):
        Trainer(cfg)


def test_figure_missing_data_is_skipped(tmp_path, capsys):
    """The documented data-dependent skip: a figure whose dataset file is
    absent is dropped with a message, everything else still constructs."""
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                             "train.img_size=16", "train.features_gen=8",
                             "train.features_disc=8", "model.noise_dim=16",
                             "calc_fid=False", "save_ckpts=False",
                             "precision=32",
                             f"output_root={tmp_path}", "version=t"])
    n_base = len(Trainer(cfg).figures)
    assert n_base > 0

    from lightning_gan_zoo_tpu.config import registry

    def _needs_data(*a, **kw):
        raise FileNotFoundError("/no/such/analysis_root")

    registry.register("tests.needs_data_figure")(_needs_data)
    try:
        cfg2 = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                                  "train.img_size=16", "train.features_gen=8",
                                  "train.features_disc=8",
                                  "model.noise_dim=16",
                                  "calc_fid=False", "save_ckpts=False",
                                  "precision=32",
                                  f"output_root={tmp_path}", "version=t2"])
        cfg2.figures["needs_data"] = Config(
            {"_target_": "tests.needs_data_figure"})
        tr = Trainer(cfg2)
        assert len(tr.figures) == n_base  # skipped, others intact
        assert "missing data" in capsys.readouterr().out
    finally:
        registry._REGISTRY.pop("tests.needs_data_figure", None)


def test_eval_only_restores_and_validates(tmp_path):
    """eval_only=true: restore a trained checkpoint, run one full validation
    pass (Fake grid + figures), return metrics, and write NO checkpoints."""
    from lightning_gan_zoo_tpu.runtime.loop import train

    tiny = ["+expt=dc_gan", "dataset=synthetic", "train.img_size=16",
            "train.features_gen=8", "train.features_disc=8",
            "model.noise_dim=16", "calc_fid=False", "precision=32",
            "train.batch_size=4", "dataset.n=16",
            "figure_details.fid_callback=False"]
    cfg_a = compose(CONF_DIR, tiny + [
        "train.num_epochs=1", "save_ckpts=True",
        f"output_root={tmp_path}/a", "version=run"])
    tr_a = train(cfg_a)
    trained_step = int(tr_a.state.step)
    assert trained_step > 0
    ckpt_dir = f"{tmp_path}/a/dc_gan/run/ckpts"

    cfg_b = compose(CONF_DIR, tiny + [
        "eval_only=True", "save_ckpts=True",   # eval mode must override
        f"train.ckpt_dir={ckpt_dir}",
        f"output_root={tmp_path}/b", "version=run"])
    tr_b = train(cfg_b)
    # restored the trained state, trained no further
    assert int(tr_b.state.step) == trained_step
    # drew the figures from the restored params
    figs = list((tr_b.logging_dir / "figures").glob("*"))
    assert figs, "eval_only drew no figures"
    # and wrote no checkpoints of its own
    assert not list((tr_b.logging_dir / "ckpts").glob("model_*"))


def test_anigan_trainer_end_to_end(tmp_path):
    """The full production loop for ANIGAN through the REAL
    AnimalAnalysisFolder loader (synthetic images + npz shape analyses on
    disk): nested shape_analysis dict batches stream through the
    EpochLoader striping/stacking, the deformation + silhouette loss path
    runs, and a checkpoint lands. (The other six families get this via
    test_resume/test_tp/test_zero; anigan's loader schema is unique —
    reference core/anigan/dataset.py:7-28.)"""
    from PIL import Image
    rng = np.random.default_rng(0)
    img_root = tmp_path / "imgs" / "cls"
    img_root.mkdir(parents=True)
    ana_root = tmp_path / "analysis"
    ana_root.mkdir()
    for i in range(4):
        arr = rng.uniform(0, 255, (24, 24, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_root / f"im{i}.png")
        np.savez(ana_root / f"im{i}.npz",
                 cam_pred=np.array([1.0, 0, 0, 1, 0, 0, 0], np.float32),
                 mean_shape=rng.normal(size=(40, 3)).astype(np.float32),
                 verts=rng.normal(size=(40, 3)).astype(np.float32),
                 kp_verts=rng.normal(size=(15, 3)).astype(np.float32),
                 mask_pred=rng.uniform(size=(24, 24)).astype(np.float32),
                 faces=rng.integers(0, 40, size=(30, 3)).astype(np.float32))

    cfg = compose(CONF_DIR, [
        "+expt=anigan", "machine=local", "model.noise_dim=16",
        "nerf.siren_dim_hidden=32", "nerf.siren_num_layers=2",
        "nerf.n_pts_per_ray=4", "nerf.n_pts_per_ray_fine=4",
        "train.features_disc=8", "train.img_size=16", "precision=32",
        "resolution_annealing.resolutions=[8,16,16]",
        "variable_batch_size.batch_sizes=[2,2,2]",
        "train.num_epochs=1", "calc_fid=False", "save_ckpts=True",
        f"filepaths.birds_root={tmp_path}/imgs",
        f"filepaths.birds_analysis_root={ana_root}",
        "dataset.train.root=" + str(tmp_path / "imgs"),
        "dataset.val.root=" + str(tmp_path / "imgs"),
        "figure_details.fid_callback=False", "~figures",
        f"output_root={tmp_path}/out"])
    t = Trainer(cfg)
    t.fit()
    # 4 imgs / batch 2 = 2 micro = 1 superstep x (D+G) = 2 steps
    assert int(t.state.step) == 2
    assert "silhouette" in {k.split("/")[-1]
                            for k in _csv_metric_keys(t.logging_dir)}
    assert list((t.logging_dir / "ckpts").glob("model_*"))


def _csv_metric_keys(logging_dir):
    import csv
    with open(logging_dir / "metrics.csv") as f:
        return set(csv.DictReader(f).fieldnames or [])


def test_retention_keeps_newer_epoch_rescue(tmp_path):
    """A shared experiment-level rescue dir must never lose a NEWER-epoch
    rescue to an earlier-preempted run's retention pass: a run rescued at
    epoch 3 cleaning up after its own save must leave a concurrent run's
    epoch-50 rescue on disk (select_resume's epoch arbitration then makes
    the newest state win)."""
    state = {"w": jnp.ones((2,))}
    # concurrent run A rescued at epoch 50
    mgr_a = CheckpointManager(tmp_path, save_ckpts=True)
    mgr_a.save_best(state, epoch=50, fid=None, meta={"rescue": True})
    assert (tmp_path / "model_epoch-50").exists()
    # run B (same experiment name, same shared dir) rescued at epoch 3
    mgr_b = CheckpointManager(tmp_path, save_ckpts=True)
    mgr_b.save_best(state, epoch=3, fid=None, meta={"rescue": True})
    assert (tmp_path / "model_epoch-3").exists()
    assert (tmp_path / "model_epoch-50").exists(), \
        "newer-epoch rescue deleted by an older run's retention"
    # same-run monotonic saves still prune their predecessors
    mgr_b.save_best(state, epoch=60, fid=None, meta={"rescue": True})
    assert not (tmp_path / "model_epoch-3").exists()
    assert not (tmp_path / "model_epoch-50").exists()


def test_resume_resets_best_fid_on_calibration_flip(tmp_path):
    """Calibrated and uncalibrated FID are different scales: a resume that
    flips calibration status (weights dropped in / removed between
    requeues) must reset the stored best-FID threshold instead of
    comparing across scales (which freezes or trivialises selection)."""
    from types import SimpleNamespace

    base = ["+expt=dc_gan", "dataset=synthetic", "train.img_size=16",
            "train.features_gen=8", "train.features_disc=8",
            "model.noise_dim=16", "train.batch_size=4", "dataset.n=8",
            "calc_fid=False", "save_ckpts=False", "precision=32"]
    cfg = compose(CONF_DIR, base + [f"output_root={tmp_path}", "version=a"])
    tr = Trainer(cfg)
    tr._init_state(1)
    ckdir = tmp_path / "ck"
    mgr = CheckpointManager(ckdir, save_ckpts=True)
    mgr.save_best(jax.device_get(tr.state), epoch=0, fid=None,
                  meta={"best_fid": 66.0, "fid_calibrated": True})

    cfg2 = compose(CONF_DIR, base + [f"output_root={tmp_path}",
                                     "version=b",
                                     f"train.ckpt_dir={ckdir}"])
    # calibration flipped (stored: calibrated, now: uncalibrated) → reset
    tr2 = Trainer(cfg2)
    tr2.metrics_eval = SimpleNamespace(calibrated=False)
    tr2._init_state(1)
    assert tr2.best_fid == float("inf")
    # matching calibration → threshold carries over
    tr3 = Trainer(compose(CONF_DIR, base + [f"output_root={tmp_path}",
                                            "version=c",
                                            f"train.ckpt_dir={ckdir}"]))
    tr3.metrics_eval = SimpleNamespace(calibrated=True)
    tr3._init_state(1)
    assert tr3.best_fid == 66.0
    # no FID evaluator at all (calc_fid=false) → unknown, keep the value
    tr4 = Trainer(compose(CONF_DIR, base + [f"output_root={tmp_path}",
                                            "version=d",
                                            f"train.ckpt_dir={ckdir}"]))
    tr4._init_state(1)
    assert tr4.best_fid == 66.0
