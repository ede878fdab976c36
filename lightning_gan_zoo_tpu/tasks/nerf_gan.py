"""π-GAN and ANIGAN tasks (reference core/lightning_module.py:239-369).

TPU-native structure:
  * the training resolution is a STATIC attribute — the annealing callback
    changes it at epoch boundaries and the runtime recompiles the superstep
    for the new shape bucket (SURVEY §7.3 item 3);
  * the progressive D's fade-in alpha + iteration counter live in
    TrainState.extra as traced scalars, updated once per micro-step
    (update_iter_ semantics, core/models/pigan.py:174-177);
  * custom LambdaLR-equivalent LR decay: linear over 10k optimizer steps to
    lr/4 (D) and lr/5 (G) (lightning_module.py:254-265).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..nerf.sampling import sample_full_xys, sample_images_at_xys
from ..ops import losses as L
from .base import GANTask, apply_model
from .gan2d import _metrics


class PIGAN(GANTask):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.resolution_list = list(cfg.resolution_annealing.resolutions)
        self.training_resolution = int(
            cfg.train.get("training_resolution",
                          self.resolution_list[0]))
        self.add_layer_iters = int(cfg.discriminator.get("add_layer_iters",
                                                         10000))

    # -- rngs ---------------------------------------------------------------
    def model_rngs(self, rng) -> Dict[str, jax.Array]:
        r = jax.random.split(rng, 4)
        return {"view": r[0], "depth": r[1], "fine": r[2], "deform": r[3]}

    def sample_view(self, rng, n: int):
        from ..models.pigan import sample_pigan_view
        va = self.cfg.generator.view_args
        return sample_pigan_view(rng, n, va.azimuth_low, va.azimuth_high)

    # -- init ---------------------------------------------------------------
    def init(self, rng: jax.Array):
        rng_g, rng_d, rng_z, rng_extra = jax.random.split(rng, 4)
        z = self.sample_z(rng_z, 2)
        g_vars = self.generator.init(
            {"params": rng_g, **self.model_rngs(rng_extra)}, z,
            sample_res=self.resolution_list[0], train=False)
        img = jnp.zeros((2, self.resolution_list[0],
                         self.resolution_list[0], 3), jnp.float32)
        d_vars = self.discriminator.init(
            rng_d, img, alpha=0.0, current_res=self.resolution_list[0],
            train=False)
        return dict(g_vars), dict(d_vars)

    def initial_extra(self) -> Dict[str, Any]:
        return {"alpha": jnp.zeros((), jnp.float32),
                "iterations": jnp.zeros((), jnp.int32)}

    def update_extra_after_microstep(self, extra):
        # update_iter_: alpha decays by 1/add_layer_iters, clamped at 0
        # (pigan.py:174-177), stepped once per training_step (:321)
        return {"alpha": jnp.maximum(
            extra["alpha"] - 1.0 / self.add_layer_iters, 0.0),
            "iterations": extra["iterations"] + 1}

    def increase_resolution(self, new_res: int):
        self.training_resolution = int(new_res)

    def reset_alpha(self, extra):
        """increase_resolution_ (pigan.py:166-172): fade-in restarts at 1."""
        return {"alpha": jnp.ones((), jnp.float32),
                "iterations": jnp.zeros((), jnp.int32)}

    # -- optimizers -----------------------------------------------------------
    def configure_optimizers(self, steps_per_epoch: int,
                             epoch_supersteps=None):
        # the π-GAN decay is a pure function of the optimizer update count
        # (10k-step linear ramp, lightning_module.py:254-262) — the
        # epoch-superstep table doesn't apply
        from ..runtime.optim import build_optimizer, pigan_decay_schedule
        d_lr = float(self.cfg.disc_optimiser.lr)
        g_lr = float(self.cfg.gen_optimiser.lr)
        d_tx = build_optimizer(self.cfg.disc_optimiser,
                               pigan_decay_schedule(d_lr, d_lr / 4))
        g_tx = build_optimizer(self.cfg.gen_optimiser,
                               pigan_decay_schedule(g_lr, g_lr / 5))
        return d_tx, g_tx

    # -- losses ----------------------------------------------------------------
    def _render_fake(self, g_params, g_state, batch, z, rng, train=True):
        fake, g_state = apply_model(
            self.generator, g_params, g_state, z,
            rngs=self.model_rngs(rng), train=train,
            sample_res=self.training_resolution)
        return fake, g_state

    def _sample_real(self, batch):
        real = batch["image"]
        rays_xy = sample_full_xys(real.shape[0], self.training_resolution)
        return sample_images_at_xys(real, rays_xy)

    def disc_loss(self, d_params, g_params, g_state, d_state, batch, z, rng,
                  extra):
        real_sampled = self._sample_real(batch)
        fake, g_state = self._render_fake(g_params, g_state, batch, z, rng)
        fake_rgb = jax.lax.stop_gradient(fake[..., :3])
        alpha = extra["alpha"]

        def d_apply(params, x):
            out, _ = apply_model(self.discriminator, params, d_state, x,
                                 alpha=alpha,
                                 current_res=self.training_resolution,
                                 mutable=False)
            return out

        d_real = d_apply(d_params, real_sampled.astype(self.dtype))
        d_fake = d_apply(d_params, fake_rgb.astype(self.dtype))
        divergence = L.hinge_d_loss(d_real, d_fake)

        def d_fn_hp(x):
            out, _ = apply_model(self.discriminator_hp, d_params, d_state, x,
                                 alpha=alpha,
                                 current_res=self.training_resolution,
                                 mutable=False)
            return out

        r1 = float(self.cfg.loss_weight.reg) * L.r1_penalty(
            d_fn_hp, real_sampled)
        loss = r1 + divergence
        return loss, {"metrics": _metrics(d_loss=loss, r1=r1),
                      "g_state": g_state, "d_state": d_state}

    def gen_loss(self, g_params, d_params, g_state, d_state, batch, z, rng,
                 extra):
        fake, g_state = self._render_fake(g_params, g_state, batch, z, rng)
        d_out, _ = apply_model(self.discriminator, d_params, d_state,
                               fake[..., :3].astype(self.dtype),
                               alpha=extra["alpha"],
                               current_res=self.training_resolution,
                               mutable=False)
        loss = L.pigan_g_loss(d_out)
        return loss, {"metrics": _metrics(g_loss=loss),
                      "g_state": g_state, "d_state": d_state}

    # -- sampling ---------------------------------------------------------------
    def generate(self, g_params, g_state, z, rng=None, sample_res=None,
                 extra=None, **kwargs):
        # ``extra`` (TrainState.extra — the progressive-growing alpha) only
        # conditions D; accept-and-ignore keeps the GANTask.generate
        # contract (serving/export.py passes it uniformly)
        rngs = self.model_rngs(rng if rng is not None
                               else jax.random.PRNGKey(0))
        out, _ = apply_model(self.generator, g_params, g_state, z,
                             train=False, rngs=rngs, mutable=False,
                             sample_res=sample_res or int(
                                 self.cfg.train.img_size), **kwargs)
        return out


class ANIGAN(PIGAN):
    """Adds mesh-guided deformation + silhouette supervision
    (lightning_module.py:324-369)."""

    def deformation_parameters(self, g_params, g_state, shape_analysis):
        """Figure-facing helper (reference generator.deformer access at
        figures/types.py:428-430)."""
        return self.generator.apply({"params": g_params, **g_state},
                                    shape_analysis,
                                    method="calculate_deformation")

    def _prep(self, batch, g_params, g_state, rng):
        from ..nerf.cameras import convert_cam_pred
        sa = batch["shape_analysis"]
        cameras, scale = convert_cam_pred(sa["cam_pred"])
        deform_params = self.generator.apply(
            {"params": g_params, **g_state}, sa,
            method="calculate_deformation")
        kwargs = dict(cameras=cameras, ray_scale=scale,
                      deformation_parameters=deform_params,
                      deformed_verts=sa["verts"],
                      mean_shape_verts=sa["mean_shape"],
                      kp_verts=sa["kp_verts"])
        return kwargs, sa

    def _render_fake_anigan(self, g_params, g_state, batch, z, rng):
        kwargs, sa = self._prep(batch, g_params, g_state, rng)
        fake, g_state = apply_model(
            self.generator, g_params, g_state, z,
            rngs=self.model_rngs(rng), train=True,
            sample_res=self.training_resolution, **kwargs)
        return fake, g_state, sa

    def disc_loss(self, d_params, g_params, g_state, d_state, batch, z, rng,
                  extra):
        real_sampled = self._sample_real(batch)
        fake, g_state, _ = self._render_fake_anigan(g_params, g_state, batch,
                                                    z, rng)
        fake_rgb = jax.lax.stop_gradient(fake[..., :3])
        alpha = extra["alpha"]

        def d_apply(params, x, hp=False):
            disc = self.discriminator_hp if hp else self.discriminator
            out, _ = apply_model(disc, params, d_state, x, alpha=alpha,
                                 current_res=self.training_resolution,
                                 mutable=False)
            return out

        d_real = d_apply(d_params, real_sampled.astype(self.dtype))
        d_fake = d_apply(d_params, fake_rgb.astype(self.dtype))
        divergence = L.hinge_d_loss(d_real, d_fake)
        r1 = float(self.cfg.loss_weight.reg) * L.r1_penalty(
            lambda x: d_apply(d_params, x, hp=True), real_sampled)
        loss = r1 + divergence
        return loss, {"metrics": _metrics(d_loss=loss, r1=r1),
                      "g_state": g_state, "d_state": d_state}

    def gen_loss(self, g_params, d_params, g_state, d_state, batch, z, rng,
                 extra):
        fake, g_state, sa = self._render_fake_anigan(g_params, g_state,
                                                     batch, z, rng)
        d_out, _ = apply_model(self.discriminator, d_params, d_state,
                               fake[..., :3].astype(self.dtype),
                               alpha=extra["alpha"],
                               current_res=self.training_resolution,
                               mutable=False)
        loss = L.pigan_g_loss(d_out)
        # silhouette MSE on the alpha channel vs the sampled predicted mask
        # (lightning_module.py:357-361)
        rays_xy = sample_full_xys(fake.shape[0], self.training_resolution)
        sil = sample_images_at_xys(sa["mask_pred"][..., None], rays_xy)
        sil_loss = jnp.mean(jnp.square(fake[..., 3] - sil[..., 0]))
        loss = loss + float(self.cfg.loss_weight.silhouette) * sil_loss
        return loss, {"metrics": _metrics(g_loss=loss,
                                          silhouette=sil_loss),
                      "g_state": g_state, "d_state": d_state}
