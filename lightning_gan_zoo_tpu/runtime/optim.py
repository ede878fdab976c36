"""Optimizer + LR-schedule construction from config nodes.

The reference instantiates torch optimizers from ``_target_`` nodes
(core/lightning_module.py:75-87) and pairs them with LR schedulers from
conf/lr_scheduler/*.yaml. Equivalents here are optax transforms with schedule
callables; hyperparameters are matched to the torch defaults the reference
relies on (RMSprop alpha=0.99 eps=1e-8; Adam eps=1e-8).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import optax

from ..config.node import Config

Schedule = Callable[[int], float]


def constant_schedule(_base_lr: float, **_kw) -> Schedule:
    """StepLR(step_size=-1, gamma=1) — a no-op scheduler
    (conf/lr_scheduler/step_lr.yaml)."""
    return lambda step: 1.0


def make_epoch_from_count(steps_per_epoch: int,
                          updates_per_superstep: int = 1,
                          epoch_supersteps: Optional[Sequence[int]] = None
                          ) -> Schedule:
    """Map an optax per-optimizer update count onto the training epoch.

    The reference steps its LR schedulers once per *epoch* (PL's default
    interval); here schedules are functions of the optax update count, so
    the epoch must be recovered from it. Two corrections over the naive
    ``count // steps_per_epoch``:

    * each optimizer advances its count ``freq`` times per superstep
      (HoloGAN's G runs gen_freq=2 updates per cycle — without the
      multiplier its ramp would decay at twice the reference rate);
    * with variable_batch_size / epoch-scheduled accumulation the
      supersteps-per-epoch changes at annealing boundaries —
      ``epoch_supersteps`` (one entry per epoch, precomputed by the
      Trainer) makes the mapping exact via its cumulative boundaries.
    """
    upd = max(int(updates_per_superstep), 1)
    if epoch_supersteps is not None and len(set(epoch_supersteps)) > 1:
        import numpy as np
        bounds = np.cumsum(np.asarray(epoch_supersteps, dtype=np.int64)
                           * upd)

        def fn(count):
            import jax.numpy as jnp
            return jnp.searchsorted(jnp.asarray(bounds), count,
                                    side="right")
        return fn
    spe = (int(epoch_supersteps[0]) if epoch_supersteps
           else int(steps_per_epoch))
    return lambda count: count // max(spe * upd, 1)


def hologan_schedule(total_epochs: int, steps_per_epoch: int,
                     updates_per_superstep: int = 1,
                     epoch_supersteps: Optional[Sequence[int]] = None
                     ) -> Schedule:
    """HoloGAN ramp: constant for the first half of training, then linear
    decay to zero (core/utils/hologan.py:3-9). The reference steps it per
    epoch; here the epoch index derives from the optimizer update count
    (see make_epoch_from_count)."""
    epoch_of = make_epoch_from_count(steps_per_epoch, updates_per_superstep,
                                     epoch_supersteps)

    def fn(step):
        import jax.numpy as jnp
        epoch = epoch_of(step)
        half = total_epochs / 2.0
        return jnp.where(epoch <= half, 1.0,
                         jnp.maximum(1.0 - (epoch - half) / half, 0.0))
    return fn


def pigan_decay_schedule(base_lr: float, target_lr: float,
                         span: int = 10000) -> Schedule:
    """π-GAN LambdaLR: linear ramp from lr to target_lr over ``span`` steps
    (core/lightning_module.py:254-262)."""
    ratio = target_lr / base_lr

    def fn(step):
        import jax.numpy as jnp
        frac = jnp.clip(step / span, 0.0, 1.0)
        return (1.0 - frac) + ratio * frac
    return fn


_TORCH_OPT_ALIASES = {
    "torch.optim.Adam": "adam",
    "torch.optim.AdamW": "adamw",
    "torch.optim.RMSprop": "rmsprop",
    "torch.optim.SGD": "sgd",
}


def build_optimizer(opt_cfg: Config, schedule: Optional[Schedule] = None
                    ) -> optax.GradientTransformation:
    """Build an optax optimizer from a ``_target_`` config node.

    ``schedule`` multiplies the base lr per optimizer step (LambdaLR-style).
    """
    target = opt_cfg["_target_"]
    kind = _TORCH_OPT_ALIASES.get(target)
    if kind is None:
        kind = target.rsplit(".", 1)[-1].lower()
    lr = float(opt_cfg["lr"])

    if schedule is not None:
        sched = schedule
        lr_arg: float | Callable = lambda step: lr * sched(step)
    else:
        lr_arg = lr

    if kind == "adam":
        betas: Sequence[float] = opt_cfg.get("betas", (0.9, 0.999))
        return optax.adam(lr_arg, b1=float(betas[0]), b2=float(betas[1]),
                          eps=1e-8)
    if kind == "adamw":
        betas = opt_cfg.get("betas", (0.9, 0.999))
        return optax.adamw(lr_arg, b1=float(betas[0]), b2=float(betas[1]),
                           eps=1e-8,
                           weight_decay=float(opt_cfg.get("weight_decay", 1e-2)))
    if kind == "rmsprop":
        return optax.rmsprop(lr_arg, decay=float(opt_cfg.get("alpha", 0.99)),
                             eps=float(opt_cfg.get("eps", 1e-8)),
                             momentum=(float(opt_cfg["momentum"])
                                       if opt_cfg.get("momentum") else None))
    if kind == "sgd":
        return optax.sgd(lr_arg, momentum=opt_cfg.get("momentum"))
    raise ValueError(f"Unsupported optimiser target: {target!r}")


def build_lr_schedule(sched_cfg: Optional[Config], *, steps_per_epoch: int,
                      total_epochs: int, updates_per_superstep: int = 1,
                      epoch_supersteps: Optional[Sequence[int]] = None
                      ) -> Optional[Schedule]:
    """Map a conf/lr_scheduler node onto a step→scale callable.

    ``updates_per_superstep`` is the calling optimizer's frequency (its
    optax count advances that many times per superstep);
    ``epoch_supersteps`` is the Trainer's exact per-epoch superstep table
    (see make_epoch_from_count).
    """
    if sched_cfg is None:
        return None
    target = sched_cfg.get("_target_", "")
    if target.endswith("StepLR"):
        step_size = int(sched_cfg.get("step_size", -1))
        gamma = float(sched_cfg.get("gamma", 1.0))
        if step_size <= 0 or gamma == 1.0:
            return None  # no-op (conf/lr_scheduler/step_lr.yaml)
        epoch_of = make_epoch_from_count(steps_per_epoch,
                                         updates_per_superstep,
                                         epoch_supersteps)

        def fn(step):
            return gamma ** (epoch_of(step) // step_size)
        return fn
    if "hologan" in target:
        return hologan_schedule(int(sched_cfg.get("total_epochs",
                                                  total_epochs)),
                                steps_per_epoch, updates_per_superstep,
                                epoch_supersteps)
    raise ValueError(f"Unsupported lr scheduler: {target!r}")
