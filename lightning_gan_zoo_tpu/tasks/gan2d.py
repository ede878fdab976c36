"""2D GAN families: DCGAN, GANStabilityR1, WGAN, WGAN-GP, HoloGAN.

Loss math mirrors the reference training steps one-to-one
(core/lightning_module.py:104-237); see each class docstring for the
file:line anchors.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import losses as L
from .base import GANTask, apply_model


def _metrics(**kw):
    return {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}


class DCGAN(GANTask):
    """Non-saturating BCE GAN (lightning_module.py:104-128).

    D: (BCE(D(real),1) + BCE(D(fake),0)) / 2 ; G: BCE(D(fake),1).
    """

    def disc_loss(self, d_params, g_params, g_state, d_state, batch, z, rng,
                  extra):
        real = batch["image"]
        fake, g_state = apply_model(self.generator, g_params, g_state, z)
        fake = jax.lax.stop_gradient(fake)
        d_real, d_state = apply_model(self.discriminator, d_params, d_state,
                                      real.astype(self.dtype))
        d_fake, d_state = apply_model(self.discriminator, d_params, d_state,
                                      fake.astype(self.dtype))
        loss = (L.bce_with_logits(d_real, jnp.ones_like(d_real))
                + L.bce_with_logits(d_fake, jnp.zeros_like(d_fake))) / 2
        return loss, {"metrics": _metrics(d_loss=loss),
                      "g_state": g_state, "d_state": d_state}

    def gen_loss(self, g_params, d_params, g_state, d_state, batch, z, rng,
                 extra):
        fake, g_state = apply_model(self.generator, g_params, g_state, z)
        d_fake, d_state = apply_model(self.discriminator, d_params, d_state,
                                      fake)
        loss = L.bce_with_logits(d_fake, jnp.ones_like(d_fake))
        return loss, {"metrics": _metrics(g_loss=loss),
                      "g_state": g_state, "d_state": d_state}


class GANStabilityR1(DCGAN):
    """BCE + R1 penalty on reals (lightning_module.py:130-156). The penalty is
    cfg.loss_weight.reg × mean ||∇_x D(x)||² and the BCE terms are NOT halved
    (:147).

    D(real) runs ONCE, through the fp32 twin of D, serving both the BCE-real
    term and the R1 gradient — exactly the reference's graph shape
    (:140-146 reuses disc_real for both; one forward, one create_graph
    backward)."""

    def disc_loss(self, d_params, g_params, g_state, d_state, batch, z, rng,
                  extra):
        real = batch["image"]
        fake, g_state = apply_model(self.generator, g_params, g_state, z)
        fake = jax.lax.stop_gradient(fake)

        def d_fn(x):
            out, _ = apply_model(self.discriminator_hp, d_params, d_state, x,
                                 mutable=False)
            return out

        r1_raw, d_real = L.r1_penalty_and_logits(d_fn, real)
        d_fake, d_state = apply_model(self.discriminator, d_params, d_state,
                                      fake.astype(self.dtype))
        bce = (L.bce_with_logits(d_real, jnp.ones_like(d_real))
               + L.bce_with_logits(d_fake, jnp.zeros_like(d_fake)))
        r1 = float(self.cfg.loss_weight.reg) * r1_raw
        loss = r1 + bce
        return loss, {"metrics": _metrics(d_loss=loss, r1=r1),
                      "g_state": g_state, "d_state": d_state}


class WGAN(GANTask):
    """Wasserstein GAN with weight clipping (lightning_module.py:158-182).
    All D params clamp to ±cfg.train.weight_clip at the top of EVERY
    micro-step — both D- and G-phases, as in the reference (:160-162)."""

    clips_disc = True

    def clip_disc(self, d_params):
        c = float(self.cfg.train.weight_clip)
        return jax.tree.map(lambda p: jnp.clip(p, -c, c), d_params)

    def disc_loss(self, d_params, g_params, g_state, d_state, batch, z, rng,
                  extra):
        real = batch["image"]
        fake, g_state = apply_model(self.generator, g_params, g_state, z)
        fake = jax.lax.stop_gradient(fake)
        d_real, d_state = apply_model(self.discriminator, d_params, d_state,
                                      real.astype(self.dtype))
        d_fake, d_state = apply_model(self.discriminator, d_params, d_state,
                                      fake.astype(self.dtype))
        loss = L.wasserstein_d_loss(d_real, d_fake)
        return loss, {"metrics": _metrics(d_loss=loss),
                      "g_state": g_state, "d_state": d_state}

    def gen_loss(self, g_params, d_params, g_state, d_state, batch, z, rng,
                 extra):
        fake, g_state = apply_model(self.generator, g_params, g_state, z)
        d_fake, d_state = apply_model(self.discriminator, d_params, d_state,
                                      fake)
        loss = L.wasserstein_g_loss(d_fake)
        return loss, {"metrics": _metrics(g_loss=loss),
                      "g_state": g_state, "d_state": d_state}


class WGANGP(WGAN):
    """WGAN with gradient penalty instead of clipping
    (lightning_module.py:184-207): loss_d = λ·GP − (E[D(real)] − E[D(fake)])."""

    clips_disc = False

    def clip_disc(self, d_params):
        return d_params

    def disc_loss(self, d_params, g_params, g_state, d_state, batch, z, rng,
                  extra):
        real = batch["image"]
        fake, g_state = apply_model(self.generator, g_params, g_state, z)
        fake = jax.lax.stop_gradient(fake)
        d_real, d_state = apply_model(self.discriminator, d_params, d_state,
                                      real.astype(self.dtype))
        d_fake, d_state = apply_model(self.discriminator, d_params, d_state,
                                      fake.astype(self.dtype))

        def d_fn(x):
            out, _ = apply_model(self.discriminator_hp, d_params, d_state, x,
                                 mutable=False)
            return out

        gp = L.gradient_penalty(d_fn, real, fake, rng)
        loss = (float(self.cfg.loss_weight.lambda_gp) * gp
                + L.wasserstein_d_loss(d_real, d_fake))
        return loss, {"metrics": _metrics(d_loss=loss, gp=gp),
                      "g_state": g_state, "d_state": d_state}


class HOLOGAN(GANTask):
    """HoloGAN: BCE adversarial loss + latent-reconstruction "q loss" on both
    sides (lightning_module.py:209-237). D returns (logit, z_pred); G samples
    a random 6-dof view internally per forward (hologan_generator.py:80-119),
    which here consumes an explicit 'view' RNG stream."""

    def model_rngs(self, rng) -> Dict[str, jax.Array]:
        return {"view": rng}

    def sample_view(self, rng, n: int):
        """6-dof pose sampler exposed for figures (Interpolation3d etc.,
        reference types.py:275-276)."""
        from ..models.hologan import sample_view
        return sample_view(rng, n, self.cfg.generator.view_args)

    def disc_loss(self, d_params, g_params, g_state, d_state, batch, z, rng,
                  extra):
        real = batch["image"]
        fake, g_state = apply_model(self.generator, g_params, g_state, z,
                                    rngs=self.model_rngs(rng))
        fake = jax.lax.stop_gradient(fake)
        (d_real, _), d_state = apply_model(self.discriminator, d_params,
                                           d_state, real.astype(self.dtype))
        (d_fake, z_pred), d_state = apply_model(self.discriminator, d_params,
                                                d_state,
                                                fake.astype(self.dtype))
        loss_disc = (L.bce_with_logits(d_real, jnp.ones_like(d_real))
                     + L.bce_with_logits(d_fake, jnp.zeros_like(d_fake))) / 2
        q_loss = jnp.mean(jnp.square(z_pred.astype(jnp.float32)
                                     - z.astype(jnp.float32)))
        loss = loss_disc + q_loss
        return loss, {"metrics": _metrics(d_loss=loss_disc, q_loss=q_loss),
                      "g_state": g_state, "d_state": d_state}

    def gen_loss(self, g_params, d_params, g_state, d_state, batch, z, rng,
                 extra):
        fake, g_state = apply_model(self.generator, g_params, g_state, z,
                                    rngs=self.model_rngs(rng))
        (d_fake, z_pred), d_state = apply_model(self.discriminator, d_params,
                                                d_state, fake)
        loss_gen = L.bce_with_logits(d_fake, jnp.ones_like(d_fake))
        q_loss = jnp.mean(jnp.square(z_pred.astype(jnp.float32)
                                     - z.astype(jnp.float32)))
        loss = loss_gen + q_loss
        return loss, {"metrics": _metrics(g_loss=loss_gen, q_loss=q_loss),
                      "g_state": g_state, "d_state": d_state}
