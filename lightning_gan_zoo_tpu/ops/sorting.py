"""Sort with a gather-based gradient.

jnp.sort's VJP scatters cotangents through the permutation — and scatters
are pathologically slow on this TPU stack (measured 15.3 ms fwd+bwd for the
π-GAN fine-pass depth sort vs 6.3 ms for the ENTIRE SIREN trunk). The
gradient of a sort is exactly a permutation of the cotangent, so it can be
expressed as a gather by the inverse permutation instead — same math, no
scatter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def sort_last(x):
    """Ascending sort along the last axis, gradient via inverse-permutation
    gather (identical values+grads to jnp.sort, far faster backward)."""
    return jnp.sort(x, axis=-1)


def _fwd(x):
    idx = jnp.argsort(x, axis=-1)
    out = jnp.take_along_axis(x, idx, axis=-1)
    inv = jnp.argsort(idx, axis=-1)
    return out, inv


def _bwd(inv, g):
    return (jnp.take_along_axis(g, inv, axis=-1),)


sort_last.defvjp(_fwd, _bwd)
