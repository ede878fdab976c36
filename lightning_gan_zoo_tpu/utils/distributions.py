"""Noise distributions as JAX sampler objects.

The reference instantiates torch.distributions targets from
conf/noise_distn/*.yaml (Normal(0,1) / Uniform(-1,1)) and calls
``.sample((B, noise_dim))`` on the host every step
(core/lightning_module.py:49-50,107). Here sampling is a pure function of an
explicit PRNG key so it can live *inside* the jitted train step — no
host→device copy per step.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Normal:
    loc: float = 0.0
    scale: float = 1.0

    def sample(self, rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
        return self.loc + self.scale * jax.random.normal(rng, shape, dtype)


@dataclasses.dataclass(frozen=True)
class Uniform:
    low: float = -1.0
    high: float = 1.0

    def sample(self, rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
        return jax.random.uniform(rng, shape, dtype,
                                  minval=self.low, maxval=self.high)
