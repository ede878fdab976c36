"""Ray/pdf sampling utilities (reference core/nerf/utils.py + raysampler.py).

All samplers take explicit PRNG keys and static shapes — jit-clean, no host
RNG (the reference stratifies with torch.rand_like, raysampler.py:235, and
samples the fine pdf with torch.rand, utils.py:47).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_full_xys(batch_size: int, img_size: int) -> jax.Array:
    """Full-image NDC xy grid with half-pixel offsets, +x/+y flipped to match
    pytorch3d screen conventions (reference core/nerf/utils.py:131-154:
    linspace from 1−1/s down to −1+1/s in both axes).

    Returns (batch, img_size, img_size, 2)."""
    half = 1.0 / img_size
    ys = jnp.linspace(1.0 - half, -1.0 + half, img_size)
    xs = jnp.linspace(1.0 - half, -1.0 + half, img_size)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([xx, yy], axis=-1)
    return jnp.broadcast_to(grid[None], (batch_size, img_size, img_size, 2))


def sample_mc_xys(rng: jax.Array, batch_size: int, n_rays: int) -> jax.Array:
    """Monte-Carlo xy sampler in [-1,1]² (utils.py:121-129)."""
    return jax.random.uniform(rng, (batch_size, n_rays, 2),
                              minval=-1.0, maxval=1.0)


def sample_images_at_xys(images: jax.Array, xys: jax.Array) -> jax.Array:
    """Bilinear-sample NHWC images at NDC ray positions (utils.py:86-119).
    grid_sample's grid convention is sign-flipped relative to the ray xys,
    hence the negation (utils.py:111)."""
    from ..ops.grid_sample import bilinear_sample
    return bilinear_sample(images, -xys, align_corners=True)


def stratify_depths(rng: jax.Array, z_vals: jax.Array) -> jax.Array:
    """Jitter each depth uniformly within its bin (raysampler.py:213-236)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    u = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * u


def sample_pdf(rng: jax.Array, bins: jax.Array, weights: jax.Array,
               n_samples: int, det: bool = False,
               eps: float = 1e-5) -> jax.Array:
    """Inverse-CDF sampling of a piecewise-constant pdf (the TF-NeRF port at
    reference core/nerf/utils.py:5-67).

    Args:
      bins: (..., n_bins+1) bin edges.
      weights: (..., n_bins) non-negative bin masses.
      n_samples: samples per distribution.
      det: deterministic mid-CDF samples instead of random.
    Returns:
      (..., n_samples) sampled positions.
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,),
                               dtype=cdf.dtype)

    # batched searchsorted-right as a dense comparison (the bin axis is
    # tiny, ≤ n_pts+1) — and the below/above values extracted WITHOUT
    # gathers: take_along_axis here was 32% of the whole π-GAN superstep
    # (trace, tools/profile_superstep.py; dynamic gathers are pathological
    # on this stack). The last-True position of the mask is the one-hot of
    # `below` via m & ~m_next, so all four lookups become tiny-axis
    # weighted reductions on the VPU.
    m = cdf[..., None, :] <= u[..., :, None]           # (..., S, B+1)
    m_next = jnp.concatenate(
        [m[..., 1:], jnp.zeros_like(m[..., :1])], axis=-1)
    oh_below = jnp.logical_and(m, ~m_next).astype(cdf.dtype)
    # above = below + 1, clipped to the last bin edge
    shifted = jnp.concatenate(
        [jnp.zeros_like(oh_below[..., :1]), oh_below[..., :-1]], axis=-1)
    oh_above = jnp.concatenate(
        [shifted[..., :-1], shifted[..., -1:] + oh_below[..., -1:]],
        axis=-1)

    cdf_below = jnp.einsum("...sj,...j->...s", oh_below, cdf)
    cdf_above = jnp.einsum("...sj,...j->...s", oh_above, cdf)
    bins_below = jnp.einsum("...sj,...j->...s", oh_below, bins)
    bins_above = jnp.einsum("...sj,...j->...s", oh_above, bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
