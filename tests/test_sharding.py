"""Multi-device data-parallel tests on the virtual 8-CPU mesh (SURVEY §4:
emulate an 8-way mesh without a TPU).

Every GAN family runs here — the reference's DDP applies uniformly to every
LightningModule (/root/reference/run_network.py:66), so the mesh superstep
must hold for every task: WGAN's per-microstep clip ordering, R1/WGAN-GP
grad-of-grad through the batch psum, HoloGAN's Pallas-kernel CPU fallback +
view RNG, π-GAN/ANIGAN extra-state alpha and deformation batches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.config import compose
from lightning_gan_zoo_tpu.config.registry import instantiate
from lightning_gan_zoo_tpu.parallel import mesh as pmesh
from lightning_gan_zoo_tpu.parallel.family_runs import (FAMILIES,
                                                        family_loss_grads,
                                                        run_family_superstep)
from lightning_gan_zoo_tpu.runtime.state import create_train_state
from lightning_gan_zoo_tpu.runtime.steps import build_superstep, microbatch_count


def test_eight_cpu_devices_present():
    assert jax.device_count() >= 8, (
        "conftest must provide 8 virtual CPU devices"
    )


_SLOW = {"hologan", "pigan", "anigan"}   # 100-200s each (measured r4)


@pytest.mark.parametrize(
    "family", [pytest.param(f, marks=pytest.mark.slow) if f in _SLOW
               else f for f in FAMILIES])
def test_data_parallel_superstep_8dev(family):
    """8-device sharded superstep runs, keeps params replicated, and its
    losses match single-device execution of the same global batch."""
    mesh8 = pmesh.make_mesh(8)
    state8, m8 = run_family_superstep(CONF_DIR, family, mesh8, batch=16)
    for k, v in m8.items():
        assert np.isfinite(float(v)), f"{family} metric {k} not finite"
    leaf = jax.tree_util.tree_leaves(state8.g_params)[0]
    assert leaf.sharding.is_fully_replicated

    mesh1 = pmesh.make_mesh(1)
    state1, m1 = run_family_superstep(CONF_DIR, family, mesh1, batch=16)
    for k in m8:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=f"{family}:{k}")

    # strict equivalence: BOTH loss gradients at init params on the same
    # global micro-batch must match across meshes to reduction-order
    # tolerance — the property the data-parallel psum actually guarantees
    # (post-Adam params are sign-noise-amplified for degenerate leaves; see
    # family_loss_grads docstring)
    g8 = family_loss_grads(CONF_DIR, family, mesh8, batch=16)
    g1 = family_loss_grads(CONF_DIR, family, mesh1, batch=16)
    np.testing.assert_allclose(float(g1["d_loss"]), float(g8["d_loss"]),
                               rtol=1e-4, err_msg=family)
    np.testing.assert_allclose(float(g1["g_loss"]), float(g8["g_loss"]),
                               rtol=1e-4, err_msg=family)
    for side in ("d_grads", "g_grads"):
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g1[side]),
                jax.tree_util.tree_leaves_with_path(g8[side])):
            a, b = np.asarray(a), np.asarray(b)
            # 0.1% of the leaf's max |grad| (atol floor 1e-3): reduction
            # regrouping under batch splitting is cancellation-amplified in
            # second-order (R1/GP) conv grads, and XLA CPU picks different
            # conv algorithms per batch shape
            tol = 1e-3 * max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(
                b, a, atol=tol,
                err_msg=f"{family}:{side}{jax.tree_util.keystr(path)}")


def test_batchnorm_is_global_batch_under_mesh():
    """DOCUMENTED DEVIATION (COMPONENTS.md): under jit-with-sharded-batch,
    nn.BatchNorm statistics are computed over the GLOBAL batch (XLA inserts
    the all-reduce) — i.e. synced BN, unlike the reference's per-replica DDP
    stats (PL sync_batchnorm defaults off). This test pins that semantic:
    the updated running mean equals the global batch mean regardless of how
    the batch is sharded."""
    from flax import linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(16, 4, 4, 3)).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x)

    mesh = pmesh.make_mesh(8)
    xs = jax.device_put(x, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    vs = jax.device_put(variables, pmesh.replicated(mesh))

    @jax.jit
    def run(v, inp):
        _, upd = bn.apply(v, inp, mutable=["batch_stats"])
        return upd["batch_stats"]["mean"]

    mean_sharded = np.asarray(run(vs, xs))
    global_mean = np.asarray(x).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(mean_sharded, global_mean, atol=1e-5)


def test_folded_superstep_8dev_matches_unfolded():
    """train.fold_steps under the 8-device mesh: the folded megastep with
    P(None, None, 'data') batch sharding matches sequential sharded
    supersteps, and accum composes (n_micro includes the accum factor)."""
    from lightning_gan_zoo_tpu.runtime.steps import build_folded_superstep

    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                             "train.img_size=16", "train.batch_size=16",
                             "train.features_disc=8", "train.features_gen=8",
                             "model.noise_dim=16", "precision=32",
                             "num_gpus=8"])
    task = instantiate(cfg.model.lm, cfg, "/tmp/lgzt_shard")
    mesh = pmesh.make_mesh(8)
    d_tx, g_tx = task.configure_optimizers(steps_per_epoch=4)
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    accum, fold = 2, 2
    raw = build_superstep(task, g_tx, d_tx, 1, 1, accum=accum)
    n_micro = microbatch_count(1, 1, accum)
    rng = np.random.default_rng(3)
    stacked = {
        "image": jnp.asarray(rng.normal(
            size=(fold, n_micro, 16, 16, 16, 3)) * 0.5, jnp.float32),
        "label": jnp.zeros((fold, n_micro, 16), jnp.int32),
    }
    root, base = jax.random.PRNGKey(9), 4

    # sequential sharded reference
    s_seq = pmesh.put_replicated(
        create_train_state(g_vars, d_vars, g_tx, d_tx), mesh)
    seq = pmesh.shard_superstep(raw, mesh, donate_state=False)
    for i in range(fold):
        b = jax.device_put(jax.tree.map(lambda x: x[i], stacked),
                           pmesh.batch_sharding(mesh))
        s_seq, _ = seq(s_seq, b,
                       jax.random.fold_in(root, base + i * n_micro))

    s_fold = pmesh.put_replicated(
        create_train_state(g_vars, d_vars, g_tx, d_tx), mesh)
    folded = pmesh.shard_superstep(build_folded_superstep(raw, fold), mesh,
                                   donate_state=False, folded=True)
    bb = jax.device_put(stacked, pmesh.batch_sharding(mesh, folded=True))
    s_fold, m = folded(s_fold, bb, (root, jnp.int32(base)))

    assert np.isfinite(float(m["d_loss"]))
    for a, b in zip(jax.tree.leaves(s_seq.g_params),
                    jax.tree.leaves(s_fold.g_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    leaf = jax.tree_util.tree_leaves(s_fold.g_params)[0]
    assert leaf.sharding.is_fully_replicated
