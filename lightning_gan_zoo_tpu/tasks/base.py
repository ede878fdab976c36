"""Task abstraction: the functional replacement for the reference's
LightningModule subclasses (core/lightning_module.py:35-369).

A GANTask owns the generator/discriminator module *definitions* (flax linen —
pure defs, parameters live in the TrainState) plus the loss logic of one GAN
family. The jitted superstep (runtime/steps.py) drives the task's
``disc_loss`` / ``gen_loss`` under jax.value_and_grad.

Conventions:
  * images are NHWC float in the normalised range of the data pipeline
  * every loss fn returns ``(loss, aux)`` where aux = {"metrics": {...},
    "g_state": ..., "d_state": ...} — mutable-collection updates (BatchNorm
    running stats, spectral-norm u vectors) ride along exactly like torch's
    in-place buffer updates during both D- and G-phases
  * rngs are explicit; z sampling happens on device inside the step
    (replacing the per-step host sampling at lightning_module.py:107)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.node import Config
from ..config.registry import instantiate
from ..utils.distributions import Normal, Uniform


def compute_dtype_from_cfg(cfg: Config):
    """precision 16 → bfloat16 (TPU-native mixed precision; the reference's
    AMP fp16 at run_network.py:71), anything else → float32."""
    return jnp.bfloat16 if int(cfg.get("precision", 32)) == 16 else jnp.float32


def build_noise_distn(node: Config):
    target = node.get("_target_", "")
    if "Normal" in target or "normal" in target:
        return Normal(loc=float(node.get("loc", 0.0)),
                      scale=float(node.get("scale", 1.0)))
    if "Uniform" in target or "uniform" in target:
        return Uniform(low=float(node.get("low", -1.0)),
                       high=float(node.get("high", 1.0)))
    raise ValueError(f"Unknown noise distribution target {target!r}")


def apply_model(module, params, state: Dict[str, Any], *args,
                train: bool = True, rngs=None, mutable: bool = True,
                method=None, **kwargs):
    """Apply a linen module, returning (out, new_state).

    ``state`` holds the non-param collections. When training with mutable
    collections present, their updates are captured and returned; otherwise
    the same state passes through.
    """
    variables = {"params": params, **state}
    mut = [k for k in state.keys()] if (train and mutable) else False
    if mut:
        out, new_vars = module.apply(variables, *args, train=train, rngs=rngs,
                                     mutable=mut, method=method, **kwargs)
        return out, dict(new_vars)
    out = module.apply(variables, *args, train=train, rngs=rngs,
                       method=method, **kwargs)
    return out, state


class GANTask:
    """Base: owns module defs, noise distribution, dtype policy."""

    #: set by subclasses that pre-process params before EVERY micro-step
    #: (WGAN weight clipping, lightning_module.py:160-162)
    clips_disc: bool = False

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.dtype = compute_dtype_from_cfg(cfg)
        self.noise_distn = build_noise_distn(cfg.model.noise_distn)
        self.noise_dim = int(cfg.model.noise_dim)
        self.generator = self.build_generator(self.dtype)
        self.discriminator = self.build_discriminator(self.dtype)
        # Twin of D for penalty branches. Default float32 (SURVEY §7.3: keep
        # grad-of-grad out of bf16); train.penalty_precision=16 opts the
        # penalty into the bf16 policy for speed (the penalty is a
        # regulariser — its norm tolerates reduced precision, but 32 is the
        # faithful default).
        pen_prec = int(cfg.train.get("penalty_precision", 32))
        pen_dtype = jnp.bfloat16 if pen_prec == 16 else jnp.float32
        self.discriminator_hp = (self.build_discriminator(pen_dtype)
                                 if pen_dtype != self.dtype
                                 else self.discriminator)

    # -- model construction -------------------------------------------------
    def build_generator(self, dtype):
        return instantiate(self.cfg.generator, dtype=dtype)

    def build_discriminator(self, dtype):
        return instantiate(self.cfg.discriminator, dtype=dtype)

    # -- initialisation ------------------------------------------------------
    def example_batch_shape(self) -> Tuple[int, ...]:
        s = int(self.cfg.train.img_size)
        c = int(self.cfg.train.channels_img)
        return (2, s, s, c)

    def init(self, rng: jax.Array):
        rng_g, rng_d, rng_z, rng_extra = jax.random.split(rng, 4)
        z = self.sample_z(rng_z, 2)
        img = jnp.zeros(self.example_batch_shape(), jnp.float32)
        g_vars = self.generator.init({"params": rng_g, **self.model_rngs(rng_extra)},
                                     z, train=False)
        d_vars = self.discriminator.init({"params": rng_d},
                                         self.example_disc_input(img),
                                         train=False)
        return dict(g_vars), dict(d_vars)

    def example_disc_input(self, img):
        return img

    def model_rngs(self, rng) -> Dict[str, jax.Array]:
        """Extra RNG streams the generator consumes (e.g. HoloGAN view
        sampling). Base 2D GANs need none."""
        return {}

    def initial_extra(self) -> Dict[str, Any]:
        """Task-specific traced state carried in TrainState.extra."""
        return {}

    # -- sampling --------------------------------------------------------------
    def sample_z(self, rng: jax.Array, n: int) -> jax.Array:
        return self.noise_distn.sample(rng, (n, self.noise_dim))

    def generate(self, g_params, g_state, z, rng: Optional[jax.Array] = None,
                 extra: Optional[Dict[str, Any]] = None, **kwargs):
        """Eval-mode image generation (figures, FID, validation grids)."""
        rngs = self.model_rngs(rng) if rng is not None else None
        out, _ = apply_model(self.generator, g_params, g_state, z,
                             train=False, rngs=rngs, mutable=False, **kwargs)
        return out

    # -- optimizers ---------------------------------------------------------
    def configure_optimizers(self, steps_per_epoch: int,
                             epoch_supersteps=None):
        """Return (d_tx, g_tx) optax transformations — the functional
        equivalent of BaseGAN.configure_optimizers
        (core/lightning_module.py:75-87).

        Epoch-derived LR schedules are built per optimizer: each one's
        optax count advances ``freq`` times per superstep (HoloGAN 1:2),
        and ``epoch_supersteps`` (when the Trainer provides it) makes the
        count→epoch mapping exact across batch-size annealing boundaries.
        """
        from ..runtime.optim import build_lr_schedule, build_optimizer
        total_epochs = int(self.cfg.train.num_epochs)

        def sched_for(freq: int):
            return build_lr_schedule(
                self.cfg.optimisation.get("lr_scheduler"),
                steps_per_epoch=steps_per_epoch,
                total_epochs=total_epochs,
                updates_per_superstep=freq,
                epoch_supersteps=epoch_supersteps)
        d_tx = build_optimizer(self.cfg.disc_optimiser,
                               sched_for(int(self.cfg.optimisation.disc_freq)))
        g_tx = build_optimizer(self.cfg.gen_optimiser,
                               sched_for(int(self.cfg.optimisation.gen_freq)))
        return d_tx, g_tx

    # -- hooks ----------------------------------------------------------------
    def clip_disc(self, d_params):
        return d_params

    # -- losses (must be overridden) -------------------------------------------
    def disc_loss(self, d_params, g_params, g_state, d_state, real, z, rng,
                  extra):
        raise NotImplementedError

    def gen_loss(self, g_params, d_params, g_state, d_state, real, z, rng,
                 extra):
        raise NotImplementedError

    def update_extra_after_microstep(self, extra: Dict[str, Any]
                                     ) -> Dict[str, Any]:
        """Called once per micro-step (reference update_iter_() cadence,
        lightning_module.py:321)."""
        return extra
