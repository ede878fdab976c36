"""Differentiable grid sampling: trilinear 3D resample + bilinear 2D sample.

TPU-native replacements for the reference's hand-rolled 8-corner gather
(core/models/hologan_generator.py:245-321) and torch grid_sample
(core/nerf/utils.py:113-118). Implemented as vectorised XLA gathers
(jnp.take on flattened volumes) — fully differentiable through both the
source values and the sample coordinates. A Pallas kernel variant of the
trilinear path lives in ops/pallas/trilinear.py for the hot HoloGAN loop.

NOTE on fidelity: the reference's gather arithmetic indexes a (H,W,D)-flattened
volume with (D,H,W)-ordered strides (hologan_generator.py:268-290), i.e. it
samples a consistently *permuted* volume. Since the source is a learned
feature volume, training absorbs the permutation; here the resample is
implemented with the standard (correct) layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def trilinear_resample(voxels: Array, coords: Array) -> Array:
    """Sample a voxel grid at continuous coordinates with trilinear weights.

    Args:
      voxels: (B, D, H, W, C) feature volume.
      coords: (B, N, 3) sample positions in voxel units, ordered (x, y, z)
        where x indexes W, y indexes H, z indexes D. Border-clamped (matches
        the reference's clamp at hologan_generator.py:256-261).

    Returns:
      (B, N, C) interpolated features.
    """
    b, d, h, w, c = voxels.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    # corner integer indices, clamped independently from the UNCLAMPED floor
    # (torch semantics, hologan_generator.py:249-261) — clamping x1 from an
    # already-clamped x0 would blend in the wrong neighbour below 0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, d - 1)
    z1i = jnp.clip(z0.astype(jnp.int32) + 1, 0, d - 1)

    flat = voxels.reshape(b, d * h * w, c)

    def gather(zi, yi, xi):
        idx = (zi * h + yi) * w + xi                       # (B, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    # fractional offsets from the *unclamped* floor (reference weights use
    # clamped corner floats; with border clamping the result matches at the
    # boundary since opposing weights pair with identical corners)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fz = (z - z0)[..., None]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz

    out = (gather(z0i, y0i, x0i) * (gx * gy * gz)
           + gather(z0i, y1i, x0i) * (gx * fy * gz)
           + gather(z0i, y0i, x1i) * (fx * gy * gz)
           + gather(z0i, y1i, x1i) * (fx * fy * gz)
           + gather(z1i, y0i, x0i) * (gx * gy * fz)
           + gather(z1i, y1i, x0i) * (gx * fy * fz)
           + gather(z1i, y0i, x1i) * (fx * gy * fz)
           + gather(z1i, y1i, x1i) * (fx * fy * fz))
    return out


def bilinear_sample(images: Array, xys: Array, *, align_corners: bool = True
                    ) -> Array:
    """torch.nn.functional.grid_sample (2D, bilinear, align_corners=True)
    equivalent for NHWC images.

    Args:
      images: (B, H, W, C).
      xys: (B, ..., 2) sample grid in [-1, 1] NDC, x→W, y→H.

    Returns:
      (B, ..., C) sampled values.
    """
    b, h, w, c = images.shape
    lead = xys.shape[1:-1]
    pts = xys.reshape(b, -1, 2)
    x, y = pts[..., 0], pts[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    flat = images.reshape(b, h * w, c)

    def gather(yi, xi):
        return jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]
    out = (gather(y0i, x0i) * (1 - ax) * (1 - ay)
           + gather(y0i, x1i) * ax * (1 - ay)
           + gather(y1i, x0i) * (1 - ax) * ay
           + gather(y1i, x1i) * ax * ay)
    return out.reshape((b,) + lead + (c,))
