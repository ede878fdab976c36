"""Ray-sharding ('sp') mesh axis tests on the virtual 8-CPU mesh.

TPU-native extra with no reference counterpart: the reference scales only by
DDP batch splitting (/root/reference/run_network.py:66), which stalls at
batch-size chips for the NeRF families (machine=local trains π-GAN at batch
4, conf/machine/local.yaml). num_sp>1 reshapes the chips into a
(data, sp) mesh and the renderer partitions each image's rays over 'sp'
(nerf/renderer.py, parallel/mesh.py) — every per-ray stage (SIREN field,
raymarch, sample_pdf, sort, fine pass) runs on 1/sp of the rays per chip,
with XLA resharding to plain batch sharding at the image hand-off to D.

Correctness contract pinned here: a (2 data × 4 sp) mesh computes the SAME
losses and gradients as a single device.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.parallel import mesh as pmesh
from lightning_gan_zoo_tpu.parallel.family_runs import (family_loss_grads,
                                                        run_family_superstep)


def test_make_mesh_sp_shape():
    mesh = pmesh.make_mesh(8, sp=4)
    assert mesh.axis_names == ("data", "sp")
    assert mesh.shape["data"] == 2 and mesh.shape["sp"] == 4
    with pytest.raises(ValueError):
        pmesh.make_mesh(8, sp=3)
    # sp=1 keeps the round-2 1-D mesh
    assert pmesh.make_mesh(8, sp=1).axis_names == ("data",)


def test_shard_rays_constraint_applies():
    """shard_rays inside a jit under mesh_context actually pins the
    (batch, rays, ...) layout to data × sp."""
    mesh = pmesh.make_mesh(8, sp=4)
    x = jnp.zeros((4, 64, 3))

    out = jax.jit(pmesh.with_mesh_context(pmesh.shard_rays, mesh))(x)
    spec = out.sharding.spec
    assert tuple(spec)[:2] == ("data", "sp"), spec

    # no-op outside a mesh context, on a plain data mesh, and for an
    # indivisible ray count (constraint skipped, not an error)
    assert pmesh.shard_rays(x) is x
    mesh1 = pmesh.make_mesh(8)
    jax.jit(pmesh.with_mesh_context(pmesh.shard_rays, mesh1))(x)
    jax.jit(pmesh.with_mesh_context(pmesh.shard_rays, mesh))(
        jnp.zeros((4, 63, 3)))


@pytest.mark.slow   # ~110s per family (measured r4)
@pytest.mark.parametrize("family", ["pigan", "anigan"])
def test_sp_superstep_matches_single_device(family):
    """(2 data × 4 sp) superstep losses + init-param loss gradients match
    single-device execution — the strict equivalence the ray partitioning
    must preserve (same contract as tests/test_sharding.py for DP)."""
    mesh_sp = pmesh.make_mesh(8, sp=4)
    state_sp, m_sp = run_family_superstep(CONF_DIR, family, mesh_sp, batch=8)
    for k, v in m_sp.items():
        assert np.isfinite(float(v)), f"{family} metric {k} not finite"
    leaf = jax.tree_util.tree_leaves(state_sp.g_params)[0]
    assert leaf.sharding.is_fully_replicated

    mesh1 = pmesh.make_mesh(1)
    state1, m1 = run_family_superstep(CONF_DIR, family, mesh1, batch=8)
    for k in m_sp:
        np.testing.assert_allclose(float(m1[k]), float(m_sp[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=f"{family}:{k}")

    g_sp = family_loss_grads(CONF_DIR, family, mesh_sp, batch=8)
    g1 = family_loss_grads(CONF_DIR, family, mesh1, batch=8)
    np.testing.assert_allclose(float(g1["d_loss"]), float(g_sp["d_loss"]),
                               rtol=1e-4, err_msg=family)
    np.testing.assert_allclose(float(g1["g_loss"]), float(g_sp["g_loss"]),
                               rtol=1e-4, err_msg=family)
    for side in ("d_grads", "g_grads"):
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g1[side]),
                jax.tree_util.tree_leaves_with_path(g_sp[side])):
            a, b = np.asarray(a), np.asarray(b)
            tol = 1e-3 * max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(
                b, a, atol=tol,
                err_msg=f"{family}:{side}{jax.tree_util.keystr(path)}")


@pytest.mark.slow   # ~700s, the single slowest test (measured r4)
def test_sp_folded_superstep_matches_sequential():
    """train.fold_steps defaults to 8 for pigan/anigan (the dispatch-bound
    volumetric families) — so the PRODUCTION sp path is folded. Pin the
    composition: the folded megastep on the (2 data × 4 sp) mesh matches
    sequential sharded supersteps (same on-device key derivation), and the
    single-device run."""
    from lightning_gan_zoo_tpu.parallel.family_runs import (
        build_family, make_family_batches)
    from lightning_gan_zoo_tpu.runtime.state import create_train_state
    from lightning_gan_zoo_tpu.runtime.steps import (build_folded_superstep,
                                                     build_superstep,
                                                     microbatch_count)

    batch, fold = 8, 2
    cfg, task = build_family(CONF_DIR, "pigan", batch, num_devices=8)
    d_tx, g_tx = task.configure_optimizers(steps_per_epoch=4)
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    raw = build_superstep(task, g_tx, d_tx,
                          int(cfg.optimisation.disc_freq),
                          int(cfg.optimisation.gen_freq))
    n_micro = microbatch_count(int(cfg.optimisation.disc_freq),
                               int(cfg.optimisation.gen_freq))
    one = make_family_batches(cfg, "pigan", batch, seed=5)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (fold,) + x.shape), one)
    root, base = jax.random.PRNGKey(7), 3

    def fresh():
        return create_train_state(g_vars, d_vars, g_tx, d_tx,
                                  extra=task.initial_extra())

    losses = {}
    for name, mesh in (("sp", pmesh.make_mesh(8, sp=4)),
                       ("one", pmesh.make_mesh(1))):
        # sequential
        s = pmesh.put_replicated(fresh(), mesh)
        seq = pmesh.shard_superstep(raw, mesh, donate_state=False)
        for i in range(fold):
            b = jax.device_put(jax.tree.map(lambda x: x[i], stacked),
                               pmesh.batch_sharding(mesh))
            s, m = seq(s, b, jax.random.fold_in(root, base + i * n_micro))
        losses[f"{name}_seq"] = {k: float(v) for k, v in m.items()}
        # folded
        sf = pmesh.put_replicated(fresh(), mesh)
        folded = pmesh.shard_superstep(build_folded_superstep(raw, fold),
                                       mesh, donate_state=False, folded=True)
        bb = jax.device_put(stacked, pmesh.batch_sharding(mesh, folded=True))
        sf, mf = folded(sf, bb, (root, jnp.int32(base)))
        for a, b in zip(jax.tree.leaves(s.g_params),
                        jax.tree.leaves(sf.g_params)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=1e-5,
                                       err_msg=f"{name}: folded != seq")

    for k, v in losses["sp_seq"].items():
        np.testing.assert_allclose(losses["one_seq"][k], v, rtol=2e-3,
                                   atol=1e-5, err_msg=f"sp vs 1dev: {k}")


def test_sp_mesh_harmless_for_2d_family():
    """A 2-D mesh with an idle sp axis must not corrupt an image-space
    family superstep (losses match single-device)."""
    mesh_sp = pmesh.make_mesh(8, sp=2)
    _, m_sp = run_family_superstep(CONF_DIR, "gan_stability_r1", mesh_sp,
                                   batch=8)
    _, m1 = run_family_superstep(CONF_DIR, "gan_stability_r1",
                                 pmesh.make_mesh(1), batch=8)
    for k in m_sp:
        np.testing.assert_allclose(float(m1[k]), float(m_sp[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=k)


def test_idle_sp_axis_does_not_overcount_kernel_weight_grads():
    """A batch-sharded Pallas kernel on a 2-D mesh replicates over the idle
    'sp' axis: its psum'd weight-grad partials must cover ONLY the axes
    that shard inputs (parallel/kernel_sharding._reduce_axes) — a psum over
    all mesh axes would multiply the gradient by sp. Exercised through
    siren_trunk's replicated trunk weights (batch sharded over 'data',
    weights replicated; sp idle)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lightning_gan_zoo_tpu.ops.pallas.siren_trunk import siren_trunk

    mesh = pmesh.make_mesh(8, sp=2)           # data=4 shards b, sp idles
    B, M, CIN, HID, L, NF = 8, 16, 3, 16, 3, 2
    k = jax.random.split(jax.random.PRNGKey(3), 6)
    x = jax.random.normal(k[0], (B, M, CIN))
    w0k = jax.random.normal(k[1], (CIN, HID)) * 0.5
    wmid = jax.random.normal(k[2], (L - 1, HID, HID)) * 0.2
    bs = jax.random.normal(k[3], (L, HID)) * 0.1
    gam = jax.random.normal(k[4], (B, NF, HID)) * 0.1 + 1.0
    bet = jax.random.normal(k[5], (B, NF, HID)) * 0.1

    def loss(*a):
        return jnp.sum(siren_trunk(*a, (30.0, 1.0, 1.0), True)
                       .astype(jnp.float32) ** 2)

    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    with pmesh.mesh_context(mesh):
        gs = jax.jit(jax.grad(loss, argnums=(1, 2, 3)),
                     in_shardings=(bsh, rep, rep, rep, bsh, bsh))(
            x, w0k, wmid, bs, gam, bet)
    gr = jax.grad(loss, argnums=(1, 2, 3))(x, w0k, wmid, bs, gam, bet)
    for got, want in zip(gs, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(want))))
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(want) / scale, atol=6e-2)
