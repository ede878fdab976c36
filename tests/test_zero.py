"""ZeRO-1 optimizer-state sharding (cfg.zero_opt) on the virtual 8-CPU mesh.

zero_opt=true shards the Adam moments' trailing axis over ('data', 'tp')
(parallel/mesh._zero_leaf_spec): the gradient psum leaves grads replicated,
GSPMD runs the elementwise moment/update math on 1/data of the elements per
chip and all-gathers only the param update. Per-chip optimizer memory
(2x params for Adam) divides by the data-axis size.

Properties pinned here: (1) the sharding rule itself, (2) a zero_opt
superstep matches the replicated-moments superstep to float
reduction-order tolerance while the moments are ACTUALLY sharded, (3) the
production Trainer trains end-to-end with zero_opt and round-trips a
checkpoint, and (4) zero composes with the 'tp' axis.

The reference has no counterpart (its DDP replicates every rank's Adam
state, run_network.py:66); this is a TPU-native memory-scaling extra.
"""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.parallel import mesh as pmesh
from lightning_gan_zoo_tpu.parallel.family_runs import run_family_superstep


def test_zero_leaf_rule():
    # data-only mesh: trailing axis over 'data' when divisible
    assert pmesh._zero_leaf_spec((3, 3, 8, 16), 8, 1, 8) == \
        P(None, None, None, ("data",))
    assert pmesh._zero_leaf_spec((16,), 8, 1, 8) == P(("data",))
    # non-divisible -> falls back to the tp rule (here: replicated)
    assert pmesh._zero_leaf_spec((10,), 8, 1, 8) == P()
    assert pmesh._zero_leaf_spec((), 8, 1, 8) == P()
    # (data=2, tp=4): a tp-sharded param's moment gains the data axis too
    assert pmesh._zero_leaf_spec((3, 3, 8, 16), 2, 4, 1) == \
        P(None, None, None, ("data", "tp"))
    # tp floor keeps the param replicated -> moment shards over data only
    assert pmesh._zero_leaf_spec((3, 3, 8, 16), 2, 4, 8) == \
        P(None, None, None, ("data",))
    # divisible by tp but not by data*tp -> keep the tp placement
    assert pmesh._zero_leaf_spec((4,), 2, 4, 1) == P("tp")


def _assert_moments_sharded(state):
    hits = 0
    for side in (state.g_opt, state.d_opt):
        for leaf in jax.tree_util.tree_leaves(side):
            if leaf.ndim and not leaf.sharding.is_fully_replicated:
                assert "data" in str(leaf.sharding.spec)
                hits += 1
    assert hits >= 4, "zero_opt left every moment leaf replicated"


@pytest.mark.parametrize("family", ["dc_gan", "gan_stability_r1"])
def test_zero_superstep_matches_plain(family):
    """(data=8) superstep with ZeRO-1 moments == replicated-moments
    superstep on the same global batch. dc_gan covers the plain path;
    gan_stability_r1 covers grad-of-grad feeding sharded moments."""
    mesh = pmesh.make_mesh(8)
    s_zero, m_zero = run_family_superstep(CONF_DIR, family, mesh, batch=16,
                                          zero=True)
    _assert_moments_sharded(s_zero)
    # params stay replicated (ZeRO-1 shards STATE, not weights)
    for leaf in jax.tree_util.tree_leaves(s_zero.g_params):
        assert leaf.sharding.is_fully_replicated

    s_rep, m_rep = run_family_superstep(CONF_DIR, family, mesh, batch=16)
    for k in m_rep:
        np.testing.assert_allclose(float(m_rep[k]), float(m_zero[k]),
                                   rtol=2e-3, atol=1e-5,
                                   err_msg=f"{family}:{k}")
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(s_rep.g_params)),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(s_zero.g_params))):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3,
            err_msg=f"{family}:g{jax.tree_util.keystr(path)}")


def test_zero_composes_with_tp():
    """(data=2, tp=4) with ZeRO-1: moments shard over BOTH axes where
    divisible, and the superstep still matches single-device execution."""
    mesh = pmesh.make_mesh(8, tp=4)
    s_z, m_z = run_family_superstep(CONF_DIR, "dc_gan", mesh, batch=16,
                                    tp_min_shard=1, zero=True)
    _assert_moments_sharded(s_z)
    both = sum(
        1 for leaf in jax.tree_util.tree_leaves(s_z.g_opt)
        if leaf.ndim and "('data', 'tp')" in str(leaf.sharding.spec))
    assert both >= 1, "no moment sharded over both axes"
    mesh1 = pmesh.make_mesh(1)
    _, m1 = run_family_superstep(CONF_DIR, "dc_gan", mesh1, batch=16)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m_z[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=f"zero-x-tp:{k}")


def test_trainer_end_to_end_zero(tmp_path):
    """The production Trainer loop with zero_opt=true: trains, moments are
    live-sharded, a checkpoint round-trips through gather_tree, and resume
    restages the sharded state."""
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.runtime.loop import Trainer

    cfg = compose(CONF_DIR, [
        "+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
        "save_ckpts=True", "train.batch_size=8", "train.img_size=16",
        "train.num_epochs=1", "dataset.n=32", "num_gpus=8",
        "zero_opt=true", "figure_details.fid_callback=False",
        f"output_root={tmp_path}", "~figures"])
    t = Trainer(cfg)
    t.fit()
    assert int(t.state.step) == 4
    _assert_moments_sharded(t.state)
    ckpts = list((t.logging_dir / "ckpts").glob("model_*"))
    assert len(ckpts) == 1

    # resume from the zero_opt checkpoint and keep training
    cfg2 = compose(CONF_DIR, [
        "+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
        "save_ckpts=False", "train.batch_size=8", "train.img_size=16",
        "train.num_epochs=2", "dataset.n=32", "num_gpus=8",
        "zero_opt=true", "figure_details.fid_callback=False",
        f"train.ckpt_dir={ckpts[0].parent}",
        f"output_root={tmp_path}/resume", "~figures"])
    t2 = Trainer(cfg2)
    t2.fit()
    assert int(t2.state.step) == 8
    _assert_moments_sharded(t2.state)


def _assert_params_sharded(state):
    hits = 0
    for side in (state.g_params, state.d_params):
        for leaf in jax.tree_util.tree_leaves(side):
            if leaf.ndim and not leaf.sharding.is_fully_replicated:
                assert "data" in str(leaf.sharding.spec)
                hits += 1
    assert hits >= 4, "fsdp left every param leaf replicated"


@pytest.mark.parametrize("family", ["dc_gan", "gan_stability_r1"])
def test_fsdp_superstep_matches_plain(family):
    """(data=8) superstep with FSDP/ZeRO-3 (params + moments sharded over
    'data', weights all-gathered at use, grads reduce-scattered) == the
    replicated superstep on the same global batch. gan_stability_r1 runs
    R1's grad-of-grad through data-sharded weights."""
    mesh = pmesh.make_mesh(8)
    s_f, m_f = run_family_superstep(CONF_DIR, family, mesh, batch=16,
                                    fsdp=True)
    _assert_params_sharded(s_f)
    _assert_moments_sharded(s_f)

    s_rep, m_rep = run_family_superstep(CONF_DIR, family, mesh, batch=16)
    for k in m_rep:
        np.testing.assert_allclose(float(m_rep[k]), float(m_f[k]),
                                   rtol=2e-3, atol=1e-5,
                                   err_msg=f"{family}:{k}")
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(s_rep.g_params)),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(s_f.g_params))):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3,
            err_msg=f"{family}:g{jax.tree_util.keystr(path)}")


def test_fsdp_composes_with_tp():
    """(data=2, tp=4) with FSDP: params shard over both axes where
    divisible and the superstep still matches single-device execution."""
    mesh = pmesh.make_mesh(8, tp=4)
    s_f, m_f = run_family_superstep(CONF_DIR, "dc_gan", mesh, batch=16,
                                    tp_min_shard=1, fsdp=True)
    _assert_params_sharded(s_f)
    both = sum(
        1 for leaf in jax.tree_util.tree_leaves(s_f.g_params)
        if leaf.ndim and "('data', 'tp')" in str(leaf.sharding.spec))
    assert both >= 1, "no param sharded over both axes"
    mesh1 = pmesh.make_mesh(1)
    _, m1 = run_family_superstep(CONF_DIR, "dc_gan", mesh1, batch=16)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m_f[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=f"fsdp-x-tp:{k}")


def test_trainer_end_to_end_fsdp(tmp_path):
    """The production Trainer with fsdp=true: trains, params + moments are
    live-sharded over 'data', a checkpoint round-trips (gather_tree), and
    resume restages the sharded state."""
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.runtime.loop import Trainer

    cfg = compose(CONF_DIR, [
        "+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
        "save_ckpts=True", "train.batch_size=8", "train.img_size=16",
        "train.num_epochs=1", "dataset.n=32", "num_gpus=8",
        "fsdp=true", "train.ema_decay=0.99",
        "figure_details.fid_callback=False",
        f"output_root={tmp_path}", "~figures"])
    t = Trainer(cfg)
    t.fit()
    assert int(t.state.step) == 4
    _assert_params_sharded(t.state)
    _assert_moments_sharded(t.state)
    # the EMA twin shards like the params
    ema_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(t.state.g_ema)
        if leaf.ndim and not leaf.sharding.is_fully_replicated)
    assert ema_sharded >= 2
    ckpts = list((t.logging_dir / "ckpts").glob("model_*"))
    assert len(ckpts) == 1

    cfg2 = compose(CONF_DIR, [
        "+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
        "save_ckpts=False", "train.batch_size=8", "train.img_size=16",
        "train.num_epochs=2", "dataset.n=32", "num_gpus=8",
        "fsdp=true", "train.ema_decay=0.99",
        "figure_details.fid_callback=False",
        f"train.ckpt_dir={ckpts[0].parent}",
        f"output_root={tmp_path}/resume", "~figures"])
    t2 = Trainer(cfg2)
    t2.fit()
    assert int(t2.state.step) == 8
    _assert_params_sharded(t2.state)
