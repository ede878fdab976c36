"""End-to-end checkpoint/resume: train across a resolution-annealing +
batch-size boundary, checkpoint, restore in a fresh Trainer, and assert the
resumed trajectory is IDENTICAL to an uninterrupted run (reference
counterpart: run_network.py:61,71 resume_from_checkpoint + the π-GAN D's
alpha/resolution/iterations buffers, pigan.py:162-177)."""
import jax
import numpy as np
import pytest

from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.config import compose
from lightning_gan_zoo_tpu.runtime.loop import train

TINY = ["+expt=pigan", "machine=local", "dataset=synthetic",
        "model.noise_dim=16", "nerf.siren_dim_hidden=32",
        "nerf.siren_num_layers=2", "nerf.n_pts_per_ray=4",
        "nerf.n_pts_per_ray_fine=4", "train.features_disc=8",
        "train.img_size=64", "precision=32", "dataset.n=16",
        "calc_fid=False", "figure_details.fid_callback=False", "~figures",
        # boundary at epoch 1: resolution 8→16 AND batch 2→4 (the machine
        # config interpolates variable_batch_size.update_epochs and the
        # accumulation start_epoch from this list)
        "resolution_annealing.resolutions=[8,16,32]",
        "resolution_annealing.update_epochs=[1,5]",
        "variable_batch_size.batch_sizes=[2,4,4]"]


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.slow   # ~400s: trains a pigan across its annealing schedule
def test_resume_across_annealing_boundary(tmp_path):
    # ---- uninterrupted run: 3 epochs (boundary inside)
    cfg_a = compose(CONF_DIR, TINY + [
        "train.num_epochs=3", "save_ckpts=False",
        f"output_root={tmp_path}/a", "version=run"])
    tr_a = train(cfg_a)

    # ---- interrupted run: 2 epochs with checkpointing...
    cfg_b = compose(CONF_DIR, TINY + [
        "train.num_epochs=2", "save_ckpts=True",
        f"output_root={tmp_path}/b", "version=run"])
    tr_b = train(cfg_b)
    ckpt_dir = f"{tmp_path}/b/pigan/run/ckpts"

    # ...then resume in a FRESH Trainer for the third epoch
    cfg_c = compose(CONF_DIR, TINY + [
        "train.num_epochs=3", "save_ckpts=False",
        f"train.ckpt_dir={ckpt_dir}",
        f"output_root={tmp_path}/c", "version=run"])
    tr_c = train(cfg_c)

    # static knobs fast-forwarded across the boundary
    assert tr_c.task.training_resolution == 16
    assert tr_c.current_batch_size == 4
    assert tr_c.epoch == tr_a.epoch == 3

    # traced state continuity: step counter, progressive-growing extras
    assert int(tr_c.state.step) == int(tr_a.state.step)
    for k in tr_a.state.extra:
        np.testing.assert_allclose(
            np.asarray(tr_c.state.extra[k]), np.asarray(tr_a.state.extra[k]),
            atol=1e-6, err_msg=f"extra[{k}] diverged across resume")
    # fade-in alpha decayed below 1 during epochs 1-2 and survived restore
    assert float(tr_c.state.extra["alpha"]) < 1.0

    # loss-trajectory continuity: resumed params equal the uninterrupted
    # run's params (same data order, same RNG stream, same schedules)
    for got, want in zip(_leaves(tr_c.state.g_params),
                         _leaves(tr_a.state.g_params)):
        np.testing.assert_allclose(got, want, atol=1e-5)
    for got, want in zip(_leaves(tr_c.state.d_params),
                         _leaves(tr_a.state.d_params)):
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_find_ckpt_ignores_orbax_tmp(tmp_path):
    """A process killed mid-commit leaves an orbax staging dir
    (*.orbax-checkpoint-tmp-*) behind — async_save widens that window to
    whole epochs. It must never be a resume candidate (restoring it would
    crash instead of falling back to the rescue/fresh start)."""
    from lightning_gan_zoo_tpu.runtime.checkpoint import CheckpointManager

    d = tmp_path / "ckpts"
    d.mkdir()
    (d / "model_best-12.34.orbax-checkpoint-tmp-123456").mkdir()
    assert CheckpointManager.find_ckpt(d) is None
    (d / "model_best-12.34").mkdir()
    assert CheckpointManager.find_ckpt(d) == d / "model_best-12.34"


def test_select_resume_prefers_newest(tmp_path):
    """Rescue-vs-best arbitration: the rescue wins only while it is the
    newest state; a stale rescue from an earlier preemption (already
    resumed and trained past) must not roll training back."""
    import json

    from lightning_gan_zoo_tpu.runtime.checkpoint import CheckpointManager

    ckpts = tmp_path / "ckpts"
    rescue = tmp_path / "ckpts_rescue"
    for p in (ckpts, rescue):
        p.mkdir()

    def put(root, name, epoch):
        d = root / name
        d.mkdir(exist_ok=True)
        (d / "train_meta.json").write_text(json.dumps({"epoch": epoch}))
        return d

    # no rescue -> best
    best = put(ckpts, "model_best-12.34", 9)
    assert CheckpointManager.select_resume(ckpts) == best
    # fresh rescue (newer epoch) -> rescue
    r = put(rescue, "model_epoch-11", 11)
    assert CheckpointManager.select_resume(ckpts) == r
    # same epoch -> rescue (written after that epoch's validation save)
    put(rescue, "model_epoch-11", 9)
    assert CheckpointManager.select_resume(ckpts).name == "model_epoch-11"
    # stale rescue (older epoch) -> best
    put(rescue, "model_epoch-11", 3)
    assert CheckpointManager.select_resume(ckpts) == best
    # rescue only, best dir empty
    for f in best.iterdir():
        f.unlink()
    best.rmdir()
    assert CheckpointManager.select_resume(ckpts).name == "model_epoch-11"
    # no ckpt_dir at all
    assert CheckpointManager.select_resume(None) is None


def test_select_resume_requeue_chain_finds_newest_rescue(tmp_path):
    """ADVICE r3 livelock: an automated requeue re-runs the same command
    (train.ckpt_dir → the ORIGINAL run's ckpts) while each resumed run
    writes its rescue in a fresh version dir. With the run-stable
    experiment-level rescue location + the widened scan, the chain keeps
    resuming from the NEWEST rescue instead of the first one forever."""
    import json

    from lightning_gan_zoo_tpu.runtime.checkpoint import CheckpointManager

    exp = tmp_path / "output" / "dc_gan"
    v0 = exp / "version_0"
    ckpts = v0 / "ckpts"
    ckpts.mkdir(parents=True)

    def put(root, name, epoch, **extra):
        d = root / name
        d.mkdir(parents=True, exist_ok=True)
        (d / "train_meta.json").write_text(
            json.dumps({"epoch": epoch, **extra}))
        return d

    best = put(ckpts, "model_best-12.34", 4)
    # preemption 1: rescue at epoch 7 in the LEGACY per-version location
    # (an old run's layout) — still honoured
    old_rescue = put(v0 / "ckpts_rescue", "model_epoch-7", 7)
    assert CheckpointManager.select_resume(ckpts) == old_rescue
    # preemption 2: the resumed run (version_1) wrote its rescue to the
    # run-stable experiment-level dir with a newer epoch — it must win
    # even though train.ckpt_dir still points at version_0/ckpts
    exp_rescue = put(exp / "ckpts_rescue", "model_epoch-9", 9)
    assert CheckpointManager.select_resume(ckpts) == exp_rescue
    # the Trainer additionally passes its own run-stable dir explicitly
    assert CheckpointManager.select_resume(
        ckpts, extra_rescue_dirs=[exp / "ckpts_rescue"]) == exp_rescue
    # once training passes the rescue epoch, best wins again
    (best / "train_meta.json").write_text(json.dumps({"epoch": 12}))
    assert CheckpointManager.select_resume(ckpts) == best
