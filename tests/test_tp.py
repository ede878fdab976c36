"""Tensor-parallel ('tp') mesh axis tests on the virtual 8-CPU mesh.

num_tp>1 shards every parameter's trailing output-channel axis (plus its
Adam moments) over 'tp' (parallel/mesh.state_shardings) and lets GSPMD
propagate the channel sharding through the conv graph. The property pinned
here is the same one tests/test_sharding.py pins for pure data
parallelism: a (data x tp) mesh superstep must match single-device
execution of the identical global batch to float reduction-order
tolerance — including R1's grad-of-grad and WGAN-GP's gradient penalty
flowing through channel-sharded weights — while the weights are ACTUALLY
sharded (not silently replicated by the partitioner).

The reference has no counterpart (its DDP replicates every rank,
run_network.py:66); 'tp' is a TPU-native scaling extra for when the
'data' axis can no longer grow.
"""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.parallel import mesh as pmesh
from lightning_gan_zoo_tpu.parallel.family_runs import (build_family,
                                                        make_family_batches,
                                                        run_family_superstep)

# every family holds under 'tp' (the NeRF families usually scale via the
# 'sp' ray axis instead, but their SIREN dense layers channel-shard fine;
# hologan's Pallas trilinear participates through its custom_partitioning
# batch rule, with GSPMD gathering the channel-sharded volume around it)
TP_FAMILIES = ("dc_gan", "wgan", "wgan_gp", "gan_stability_r1", "hologan",
               "pigan", "anigan")


def test_tp_leaf_rule():
    """The shape-based sharding rule: trailing axis over 'tp' iff divisible
    and >= min_shard per chip; scalars/non-divisible leaves replicated."""
    assert pmesh._tp_leaf_spec((3, 3, 8, 16), 4, 1) == P(None, None, None,
                                                         "tp")
    assert pmesh._tp_leaf_spec((16,), 4, 4) == P("tp")
    # min_shard floor: 16 channels / 4 chips = 4 < 8 -> replicated
    assert pmesh._tp_leaf_spec((3, 3, 8, 16), 4, 8) == P()
    # non-divisible trailing axis -> replicated
    assert pmesh._tp_leaf_spec((10,), 4, 1) == P()
    # scalar (optax count) -> replicated
    assert pmesh._tp_leaf_spec((), 4, 1) == P()
    assert pmesh._tp_leaf_spec((3, 3, 8, 16), 1, 1) == P()


def test_mesh_axes_compose():
    """data x sp x tp factorization of the 8 virtual devices."""
    m = pmesh.make_mesh(8, tp=4)
    assert m.axis_names == ("data", "tp") and m.shape["tp"] == 4
    m = pmesh.make_mesh(8, sp=2, tp=2)
    assert m.axis_names == ("data", "sp", "tp")
    assert (m.shape["data"], m.shape["sp"], m.shape["tp"]) == (2, 2, 2)
    with pytest.raises(ValueError):
        pmesh.make_mesh(8, tp=3)


def _assert_actually_tp_sharded(state, mesh):
    """At least one parameter leaf (and its Adam moment) must carry a real
    'tp'-sharded layout on the mesh devices."""
    tp = pmesh.tp_size_of(mesh)
    hits = 0
    for side in (state.g_params, state.d_params, state.g_opt, state.d_opt):
        for leaf in jax.tree_util.tree_leaves(side):
            if leaf.ndim and leaf.shape[-1] % tp == 0 and \
                    not leaf.sharding.is_fully_replicated:
                hits += 1
    assert hits >= 4, "tp mesh left every parameter leaf replicated"


_SLOW_TP = {"hologan", "pigan", "anigan"}   # 47-91s each (measured r4)


@pytest.mark.parametrize(
    "family", [pytest.param(f, marks=pytest.mark.slow) if f in _SLOW_TP
               else f for f in TP_FAMILIES])
def test_tp_superstep_matches_single_device(family):
    """(data=2, tp=4) superstep == 1-device superstep on the same global
    batch, with weights genuinely channel-sharded."""
    mesh_tp = pmesh.make_mesh(8, tp=4)
    state_tp, m_tp = run_family_superstep(CONF_DIR, family, mesh_tp,
                                          batch=16, tp_min_shard=1)
    for k, v in m_tp.items():
        assert np.isfinite(float(v)), f"{family} metric {k} not finite"
    _assert_actually_tp_sharded(state_tp, mesh_tp)

    mesh1 = pmesh.make_mesh(1)
    state1, m1 = run_family_superstep(CONF_DIR, family, mesh1, batch=16)
    for k in m_tp:
        np.testing.assert_allclose(float(m1[k]), float(m_tp[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=f"{family}:{k}")
    # post-optimizer params must round-trip to the same values (same
    # tolerance family as the losses; Adam normalises the grad scale, so
    # only reduction-order noise differs) — gathered via device_get
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(state1.g_params)),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(state_tp.g_params))):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3,
            err_msg=f"{family}:g{jax.tree_util.keystr(path)}")


@pytest.mark.slow   # ~40s (measured r4)
def test_three_axis_mesh_pigan():
    """The full (data=2, sp=2, tp=2) factorization: rays sharded over 'sp'
    inside the NeRF renderer AND weights channel-sharded over 'tp',
    simultaneously, still matches single-device execution."""
    mesh3 = pmesh.make_mesh(8, sp=2, tp=2)
    _, m3 = run_family_superstep(CONF_DIR, "pigan", mesh3, batch=8,
                                 tp_min_shard=1)
    mesh1 = pmesh.make_mesh(1)
    _, m1 = run_family_superstep(CONF_DIR, "pigan", mesh1, batch=8)
    for k in m3:
        np.testing.assert_allclose(float(m1[k]), float(m3[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=f"pigan-3axis:{k}")


def test_trainer_end_to_end_tp(tmp_path):
    """The production Trainer loop on a (data=2, tp=4) mesh: the CLI knobs
    num_gpus=8 num_tp=4 train dc_gan end-to-end, the live state is actually
    channel-sharded, and a checkpoint round-trips through the host gather."""
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.runtime.loop import Trainer

    cfg = compose(CONF_DIR, [
        "+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
        "save_ckpts=True", "train.batch_size=4", "train.img_size=16",
        "train.num_epochs=1", "dataset.n=16", "num_gpus=8", "num_tp=4",
        "tp_min_shard=1", "figure_details.fid_callback=False",
        f"output_root={tmp_path}"])
    t = Trainer(cfg)
    t.fit()
    # 16 imgs / batch 4 = 4 micro-batches = 2 supersteps x (D+G) = 4 steps
    assert int(t.state.step) == 4
    _assert_actually_tp_sharded(t.state, t.mesh)
    assert list((t.logging_dir / "ckpts").glob("*")), "no checkpoint saved"
    # figure draws consume the LIVE channel-sharded params (single-process:
    # fully addressable, no gather)
    assert (t.logging_dir / "figures" / "SampleGrid.png").exists()


def test_trainer_tp_composes_with_fold_steps(tmp_path):
    """train.fold_steps=2 on the tp mesh (the folded megastep jitted with
    per-leaf state shardings) trains end-to-end and matches the unfolded
    tp run's final params at the same seed.

    Tolerance note: under pure dp the fold is BIT-identical (measured
    max|diff| 4e-9); under tp GSPMD places the channel collectives
    differently inside the scanned megastep, so reductions reorder —
    measured max|diff| 3e-5 after two Adam steps. Same math, different
    float grouping."""
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.runtime.loop import Trainer

    common = [
        "+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
        "save_ckpts=False", "train.batch_size=4", "train.img_size=16",
        "train.num_epochs=1", "dataset.n=16", "num_gpus=8", "num_tp=4",
        "tp_min_shard=1", "figure_details.fid_callback=False", "~figures"]
    runs = {}
    for fold in (1, 2):
        cfg = compose(CONF_DIR, common + [f"train.fold_steps={fold}",
                                          f"output_root={tmp_path}/f{fold}"])
        t = Trainer(cfg)
        t.fit()
        assert int(t.state.step) == 4
        _assert_actually_tp_sharded(t.state, t.mesh)
        runs[fold] = jax.device_get(t.state.g_params)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(runs[1]),
            jax.tree_util.tree_leaves_with_path(runs[2])):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4,
            err_msg=f"fold-x-tp:g{jax.tree_util.keystr(path)}")


def test_tp_grads_match_replicated():
    """Strict check: loss gradients w.r.t. CHANNEL-SHARDED init params on
    the (data=2, tp=4) mesh equal the replicated single-device gradients —
    the invariant GSPMD's inserted collectives must preserve. dc_gan covers
    the plain path; gan_stability_r1 covers grad-of-grad (R1 penalty)
    through sharded weights."""
    for family in ("dc_gan", "gan_stability_r1"):
        mesh_tp = pmesh.make_mesh(8, tp=4)
        mesh1 = pmesh.make_mesh(1)
        out = {}
        for name, mesh in (("tp", mesh_tp), ("one", mesh1)):
            cfg, task = build_family(CONF_DIR, family, 16,
                                     num_devices=mesh.devices.size)
            g_vars, d_vars = task.init(jax.random.PRNGKey(0))
            g_params = dict(g_vars)["params"]
            d_params = dict(d_vars)["params"]
            g_state = {k: v for k, v in g_vars.items() if k != "params"}
            d_state = {k: v for k, v in d_vars.items() if k != "params"}
            if name == "tp":
                g_params = jax.device_put(
                    g_params, pmesh.params_shardings(g_params, mesh, 1))
                d_params = jax.device_put(
                    d_params, pmesh.params_shardings(d_params, mesh, 1))
            else:
                g_params, d_params = jax.device_put(
                    (g_params, d_params), pmesh.replicated(mesh))
            g_state, d_state = jax.device_put((g_state, d_state),
                                              pmesh.replicated(mesh))
            micro = jax.tree.map(
                lambda x: x[0], make_family_batches(cfg, family, 16))
            micro = jax.device_put(
                micro, pmesh.batch_sharding(mesh, stacked=False))
            z = jax.device_put(
                task.sample_z(jax.random.PRNGKey(11), 16),
                pmesh.batch_sharding(mesh, stacked=False))
            extra = jax.device_put(task.initial_extra(),
                                   pmesh.replicated(mesh))
            rng = jax.random.PRNGKey(23)
            (d_loss, _), d_grads = jax.jit(pmesh.with_mesh_context(
                jax.value_and_grad(task.disc_loss, has_aux=True), mesh))(
                d_params, g_params, g_state, d_state, micro, z, rng, extra)
            out[name] = (float(d_loss), jax.device_get(d_grads))
        np.testing.assert_allclose(out["one"][0], out["tp"][0], rtol=1e-4,
                                   err_msg=family)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(out["one"][1]),
                jax.tree_util.tree_leaves_with_path(out["tp"][1])):
            a, b = np.asarray(a), np.asarray(b)
            tol = 1e-3 * max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(
                b, a, atol=tol,
                err_msg=f"{family}{jax.tree_util.keystr(path)}")


def test_gather_tree_assembles_sharded_state():
    """parallel/mesh.gather_tree — the multi-host-safe device_get used by
    checkpoint saves and preemption rescue. Single-process every leaf is
    fully addressable (plain device_get branch); the shard-assembly math
    itself (_assemble_local, the branch multi-host tp relies on) is pinned
    directly against device_get on genuinely tp-sharded leaves."""
    mesh = pmesh.make_mesh(8, tp=4)
    state_tp, _ = run_family_superstep(CONF_DIR, "dc_gan", mesh,
                                       batch=16, tp_min_shard=1)
    host = pmesh.gather_tree(state_tp)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(state_tp.g_params)),
            jax.tree_util.tree_leaves_with_path(host.g_params)):
        assert isinstance(b, np.ndarray)
        np.testing.assert_array_equal(
            np.asarray(a), b,
            err_msg=f"gather{jax.tree_util.keystr(path)}")
    # the assembly branch, exercised explicitly on sharded + replicated +
    # scalar leaves (covers the s.index slicing for every layout)
    leaves = jax.tree_util.tree_leaves(state_tp.g_params) + [state_tp.step]
    checked_sharded = False
    for leaf in leaves:
        asm = pmesh._assemble_local(leaf)
        assert asm is not None
        np.testing.assert_array_equal(asm, jax.device_get(leaf))
        checked_sharded |= not leaf.sharding.is_fully_replicated
    assert checked_sharded, "no genuinely sharded leaf was assembled"
