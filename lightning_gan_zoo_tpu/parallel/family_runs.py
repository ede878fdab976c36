"""Per-family tiny superstep setups for multi-chip validation.

The reference applies DDP uniformly to every LightningModule
(/root/reference/run_network.py:66) — one launcher flag, seven families.
The TPU rebuild's equivalent claim (the data-parallel mesh superstep works
for every task) is validated here: ONE shared builder produces, for each GAN
family, a tiny-but-real configuration (real disc:gen frequency ratio, real
loss path — grad-of-grad, Pallas-kernel fallbacks, extra-state alpha,
multi-stream RNG, deformation batches included) plus a matching synthetic
batch, so both the driver dryrun (``__graft_entry__.dryrun_multichip``) and
the 8-device sharding tests (tests/test_sharding.py) exercise the identical
per-family path.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

FAMILIES: Tuple[str, ...] = ("dc_gan", "wgan", "wgan_gp", "gan_stability_r1",
                             "hologan", "pigan", "anigan")

_COMMON = ["dataset=synthetic", "calc_fid=False", "save_ckpts=False",
           "precision=32", "model.noise_dim=16"]

# Tiny-but-structurally-real shapes per family. 2D families shrink to 16px /
# 8 features; r1 additionally shrinks the ResNet channel caps; hologan keeps
# its fixed 4³→16³ voxel pipeline but drops planes to 8 at 32px; the NeRF
# families run the full coarse+fine renderer at resolution 8 with a 2-layer
# SIREN (mirrors tests/test_nerf.py PIGAN_TINY).
_TINY: Dict[str, List[str]] = {
    "dc_gan": ["train.img_size=16", "train.features_disc=8",
               "train.features_gen=8"],
    "wgan": ["train.img_size=16", "train.features_disc=8",
             "train.features_gen=8"],
    "wgan_gp": ["train.img_size=16", "train.features_disc=8",
                "train.features_gen=8"],
    "gan_stability_r1": ["train.img_size=16", "generator.nfilter=4",
                         "generator.nfilter_max=16",
                         "discriminator.nfilter=4",
                         "discriminator.nfilter_max=16"],
    # hologan's G topology always emits 64px (16³ voxels → 16→32→64 2D
    # stages, models/hologan.py Generator) — keep img_size=64 and shrink
    # the plane counts instead
    "hologan": ["train.img_size=64", "generator.in_planes=8",
                "discriminator.out_planes=8"],
    "pigan": ["machine=local", "nerf.siren_dim_hidden=32",
              "nerf.siren_num_layers=2", "nerf.n_pts_per_ray=4",
              "nerf.n_pts_per_ray_fine=4", "train.features_disc=8",
              "train.img_size=64", "resolution_annealing.resolutions=[8,16]"],
    "anigan": ["machine=local", "nerf.siren_dim_hidden=32",
               "nerf.siren_num_layers=2", "nerf.n_pts_per_ray=4",
               "nerf.n_pts_per_ray_fine=4", "train.features_disc=8",
               "train.img_size=64", "resolution_annealing.resolutions=[8,16]"],
}


def family_overrides(family: str, batch: int) -> List[str]:
    if family not in _TINY:
        raise ValueError(f"unknown family {family!r}; know {FAMILIES}")
    ov = [f"+expt={family}", *_COMMON, *_TINY[family],
          f"train.batch_size={batch}"]
    if family in ("pigan", "anigan"):
        ov.append(f"variable_batch_size.batch_sizes=[{batch},{batch}]")
    return ov


def build_family(conf_dir, family: str, batch: int, num_devices: int = 0):
    """Compose the tiny config and instantiate the task.

    Returns (cfg, task). ``num_devices`` > 0 additionally pins the
    reference's ``num_gpus`` knob (conf/config.yaml:4 counterpart).
    """
    from ..config import compose
    from ..config.registry import instantiate

    ov = family_overrides(family, batch)
    if num_devices:
        ov.append(f"num_gpus={num_devices}")
    cfg = compose(conf_dir, ov)
    task = instantiate(cfg.model.lm, cfg, "/tmp/lgzt_family_runs")
    return cfg, task


def make_family_batches(cfg, family: str, batch: int, seed: int = 0):
    """Synthetic micro-batch stack [n_micro, batch, ...] matching the
    family's loader schema ((image, label) tuples, lightning_module.py:61,
    plus the ANIGAN shape-analysis dict, core/anigan/dataset.py:7-28)."""
    import jax.numpy as jnp

    from ..runtime.steps import microbatch_count

    n_micro = microbatch_count(int(cfg.optimisation.disc_freq),
                               int(cfg.optimisation.gen_freq))
    img = int(cfg.train.img_size)
    c = int(cfg.train.channels_img)
    rng = np.random.default_rng(seed)
    batches = {
        "image": jnp.asarray(
            rng.normal(size=(n_micro, batch, img, img, c)).astype(np.float32)
            * 0.5),
        "label": jnp.zeros((n_micro, batch), jnp.int32),
    }
    if family == "anigan":
        def sa(shape):
            return jnp.asarray(
                rng.normal(size=(n_micro, batch) + shape).astype(np.float32))
        quat = np.tile([1.0, 0, 0, 0], (n_micro, batch, 1))
        cam = np.concatenate([np.ones((n_micro, batch, 1)),
                              np.zeros((n_micro, batch, 2)), quat], -1)
        batches["shape_analysis"] = {
            "cam_pred": jnp.asarray(cam.astype(np.float32)),
            "mean_shape": sa((40, 3)), "verts": sa((40, 3)),
            "kp_verts": sa((15, 3)),
            "mask_pred": jnp.asarray(rng.uniform(
                size=(n_micro, batch, img, img)).astype(np.float32)),
        }
    return batches


def family_loss_grads(conf_dir, family: str, mesh, batch: int,
                      seed: int = 0):
    """Grads of disc_loss and gen_loss at init params on one global
    micro-batch, computed under the mesh's batch sharding — the exact psum
    path XLA inserts for data parallelism.

    This is the strict cross-mesh equivalence primitive: gradients computed
    on 1 vs N devices must agree to float reduction-order tolerance.
    (Post-optimizer params are NOT a usable check for every family: leaves
    whose gradient is pure cancellation noise — e.g. HoloGAN's ConvTranspose
    biases, normalised away by the AdaIN that follows them — get sign-random
    grads ~1e-7 that Adam amplifies to full ±lr steps.)"""
    import jax

    from . import mesh as pmesh

    n_dev = mesh.devices.size
    cfg, task = build_family(conf_dir, family, batch, num_devices=n_dev)
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    g_params = dict(g_vars)["params"]
    d_params = dict(d_vars)["params"]
    g_state = {k: v for k, v in g_vars.items() if k != "params"}
    d_state = {k: v for k, v in d_vars.items() if k != "params"}

    batches = make_family_batches(cfg, family, batch, seed)
    micro = jax.tree.map(lambda x: x[0], batches)
    micro = jax.device_put(micro, pmesh.batch_sharding(mesh, stacked=False))
    z = jax.device_put(task.sample_z(jax.random.PRNGKey(seed + 11), batch),
                       pmesh.batch_sharding(mesh, stacked=False))
    rep = pmesh.replicated(mesh)
    g_params, d_params, g_state, d_state = jax.device_put(
        (g_params, d_params, g_state, d_state), rep)
    extra = jax.device_put(task.initial_extra(), rep)
    rng = jax.random.PRNGKey(seed + 23)

    # mesh_context so renderer-internal ray-sharding constraints (num_sp
    # meshes) see the mesh during tracing, exactly as shard_superstep does
    (d_loss, _), d_grads = jax.jit(pmesh.with_mesh_context(
        jax.value_and_grad(task.disc_loss, has_aux=True), mesh))(
        d_params, g_params, g_state, d_state, micro, z, rng, extra)
    (g_loss, _), g_grads = jax.jit(pmesh.with_mesh_context(
        jax.value_and_grad(task.gen_loss, has_aux=True), mesh))(
        g_params, d_params, g_state, d_state, micro, z, rng, extra)
    jax.block_until_ready((d_grads, g_grads))
    return {"d_loss": d_loss, "g_loss": g_loss,
            "d_grads": d_grads, "g_grads": g_grads}


def run_family_superstep(conf_dir, family: str, mesh, batch: int,
                         seed: int = 0, tp_min_shard: int = 8,
                         zero: bool = False, fsdp: bool = False):
    """One sharded superstep of ``family`` on ``mesh``; returns metrics.

    Batch sharded over the 'data' axis; state replicated, or per-leaf
    'tp'-sharded when the mesh carries a tensor-parallel axis — the exact
    production paths (parallel/mesh.shard_superstep / put_state).
    ``zero`` turns on ZeRO-1 moment sharding (cfg.zero_opt); ``fsdp``
    shards params + EMA too (cfg.fsdp, ZeRO-3)."""
    import jax

    from ..runtime.state import create_train_state
    from ..runtime.steps import build_superstep
    from . import mesh as pmesh

    n_dev = mesh.devices.size
    cfg, task = build_family(conf_dir, family, batch, num_devices=n_dev)
    d_tx, g_tx = task.configure_optimizers(steps_per_epoch=4)
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    state = pmesh.put_state(
        create_train_state(g_vars, d_vars, g_tx, d_tx,
                           extra=task.initial_extra()), mesh,
        min_shard=tp_min_shard, zero=zero, fsdp=fsdp)
    state_sh = (pmesh.state_shardings(state, mesh, tp_min_shard, zero=zero,
                                      fsdp=fsdp)
                if pmesh.tp_size_of(mesh) > 1 or zero or fsdp else None)
    step = pmesh.shard_superstep(
        build_superstep(task, g_tx, d_tx,
                        int(cfg.optimisation.disc_freq),
                        int(cfg.optimisation.gen_freq)),
        mesh, donate_state=False, state_sh=state_sh)
    batches = jax.device_put(make_family_batches(cfg, family, batch, seed),
                             pmesh.batch_sharding(mesh))
    new_state, metrics = step(state, batches, jax.random.PRNGKey(seed + 1))
    jax.block_until_ready(metrics)
    return new_state, metrics
