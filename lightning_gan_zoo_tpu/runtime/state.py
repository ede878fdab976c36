"""The functional train state: everything the jitted superstep carries.

Replaces the LightningModule's implicit mutable state (model params, two
optimizers, schedulers, step counters, progressive-growing buffers —
core/lightning_module.py:35-102, core/models/pigan.py:162-177) with one
explicit pytree that pjit shards/replicates and orbax checkpoints.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    g_state: Any          # mutable collections (batch_stats, spectral, ...)
    d_state: Any
    g_opt: Any
    d_opt: Any
    g_steps: jnp.ndarray  # optimizer-update counts (drive LR schedules)
    d_steps: jnp.ndarray
    step: jnp.ndarray     # total micro-steps (D+G), reference global_step
    extra: Dict[str, Any] = struct.field(default_factory=dict)
    # `extra` carries task-specific traced state, e.g. the π-GAN progressive
    # discriminator's fade-in alpha + iteration counter (pigan.py:162-177).
    #: opt-in exponential moving average of g_params (train.ema_decay > 0);
    #: None when disabled. The reference carries EMA only in dead vendored
    #: code (gan_stability/train.py update_average, SURVEY §2.5) — here it
    #: is a documented quality extra, off by default.
    g_ema: Any = None

    @property
    def eval_g_params(self):
        """Parameters for generation/eval: the EMA twin when enabled."""
        return self.g_params if self.g_ema is None else self.g_ema


def create_train_state(g_vars, d_vars, g_tx, d_tx, extra=None,
                       ema: bool = False) -> TrainState:
    g_vars = dict(g_vars)
    d_vars = dict(d_vars)
    g_params = g_vars.pop("params")
    d_params = d_vars.pop("params")
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        g_state=g_vars,
        d_state=d_vars,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        g_steps=jnp.zeros((), jnp.int32),
        d_steps=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        extra=extra or {},
        g_ema=jax.tree.map(jnp.copy, g_params) if ema else None,
    )
