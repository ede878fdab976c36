"""HoloGAN: 3D voxel-feature generator + spectral-norm discriminator.

Re-designs /root/reference/core/models/hologan_generator.py (345 LoC) and
hologan_discriminator.py TPU-first:

  * learned 4³ voxel constant → AdaIN(z) → two ConvTranspose3d+AdaIN blocks
    → 16³ features → rigid 6-dof transform of the volume (azimuth/elevation/
    scale/translation, hologan_generator.py:80-114,145-243) → trilinear
    resample (ops/grid_sample.trilinear_resample; reference's hand-rolled
    gather at :245-321) → depth→channel projection (:130-133) → 1×1 conv +
    two 2D AdaIN blocks → image.
  * view sampling happens ON DEVICE from an explicit 'view' RNG stream
    (replacing the per-step host numpy RNG at :86-104) so the whole forward
    stays inside the jitted step.
  * data layout NDHWC/NHWC; 3D convs lower to XLA MXU convolutions.

Documented deviations: the reference's 128px head (ConvTranspose2d k4 s1,
:72) does not actually double resolution — here it is a stride-2 transposed
conv; and the trilinear gather uses the standard volume layout (see
ops/grid_sample.py note).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.grid_sample import trilinear_resample
from .layers import AdaIN, ZMapping, conv_init


def _adain_relu(h, s, b, eps: float = 1e-8):
    """AdaIN(h; s, b) + ReLU (AdaIN holds no params).

    Measurement note (round 5, v5e hardware): a fused AdaIN+activation
    Pallas epilogue (1 read + 1 write vs XLA's 2+1) was built, hardware-
    validated for correctness (fwd+bwd parity at tiny and production
    shapes), then A/B'd on the full hologan superstep — it REGRESSED:
    17.54 ms/superstep fused vs 15.24 ms plain (MFU 14.9% vs 17.2%).
    XLA already fuses the normalisation epilogue into the surrounding
    convolution's output schedule; the custom kernel fenced that fusion.
    The kernel was deleted (see BASELINE.md "kernel verdicts")."""
    h = AdaIN(epsilon=eps, dtype=h.dtype)(h, s, b)
    return nn.relu(h)


def sample_view(rng: jax.Array, batch_size: int, view_args) -> jax.Array:
    """Sample 6-dof views [theta, gamma, scale, tx, ty, tz] (radians) —
    reference sample_view (hologan_generator.py:80-114): integer-degree
    azimuth/elevation, one shared scale scalar, uniform translations."""
    va = view_args
    r_theta, r_gamma, r_scale, r_tx, r_ty, r_tz = jax.random.split(rng, 6)
    theta = jax.random.randint(
        r_theta, (batch_size,), int(va["azimuth_low"]),
        max(int(va["azimuth_high"]), int(va["azimuth_low"]) + 1)
    ).astype(jnp.float32) * (math.pi / 180.0)
    if int(va["elevation_low"]) < int(va["elevation_high"]):
        gamma = jax.random.randint(
            r_gamma, (batch_size,), int(va["elevation_low"]),
            int(va["elevation_high"])).astype(jnp.float32) * (math.pi / 180.0)
    else:
        gamma = jnp.zeros((batch_size,), jnp.float32)
    scale = jnp.full((batch_size,), 1.0) * jax.random.uniform(
        r_scale, (), minval=float(va["scale_low"]), maxval=float(va["scale_high"]))
    tx = jax.random.uniform(r_tx, (batch_size,), minval=float(va["transX_low"]),
                            maxval=float(va["transX_high"]))
    ty = jax.random.uniform(r_ty, (batch_size,), minval=float(va["transY_low"]),
                            maxval=float(va["transY_high"]))
    tz = jax.random.uniform(r_tz, (batch_size,), minval=float(va["transZ_low"]),
                            maxval=float(va["transZ_high"]))
    return jnp.stack([theta, gamma, scale, tx, ty, tz], axis=1)


def _rigid_matrices(view: jax.Array) -> jax.Array:
    """Per-sample 4×4 transform T·S·R (hologan_generator.py:145-194)."""
    theta, gamma, scale = view[:, 0], view[:, 1], view[:, 2]
    tx, ty, tz = view[:, 3], view[:, 4], view[:, 5]
    b = view.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    cg, sg = jnp.cos(gamma), jnp.sin(gamma)
    zeros = jnp.zeros((b,))
    ones = jnp.ones((b,))

    rot_z = jnp.stack([
        c, s, zeros, zeros,
        -s, c, zeros, zeros,
        zeros, zeros, ones, zeros,
        zeros, zeros, zeros, ones], axis=1).reshape(b, 4, 4)
    rot_y = jnp.stack([
        cg, zeros, sg, zeros,
        zeros, ones, zeros, zeros,
        -sg, zeros, cg, zeros,
        zeros, zeros, zeros, ones], axis=1).reshape(b, 4, 4)
    rotation = rot_z @ rot_y

    scaling = jax.vmap(lambda sc: jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0]))
                       .at[0, 0].set(sc).at[1, 1].set(sc).at[2, 2].set(sc)
                       )(scale)
    translation = jax.vmap(
        lambda t: jnp.eye(4).at[0, 3].set(t[0]).at[1, 3].set(t[1])
        .at[2, 3].set(t[2]))(jnp.stack([tx, ty, tz], axis=1))
    return translation @ scaling @ rotation


def rigid_transform_volume(voxels: jax.Array, view: jax.Array,
                           size: int = 16, new_size: int = 16,
                           resample: str = "auto") -> jax.Array:
    """Rigid transform of a feature volume by inverse-warping the output grid
    (hologan_generator.py:198-243). voxels: (B, D, H, W, C).

    resample modes:
      'auto'   — exact trilinear; MXU kernel on TPU, XLA gather elsewhere
      'mxu'    — Pallas one-hot-matmul kernel (ops/pallas/trilinear.py)
      'gather' — XLA take_along_axis
      'shear'  — multi-pass shear decomposition (ops/shear_warp.py): ~10×
                 cheaper, exact on the affine map but a smoother resampling
                 filter (NOT bit-equivalent to trilinear) — opt-in
                 (generator.resample=shear)
    """
    b = voxels.shape[0]
    m = _rigid_matrices(view)
    centroid = jnp.eye(4).at[:3, 3].set(-size * 0.5)
    centroid_new = jnp.eye(4).at[:3, 3].set(new_size * 0.5)
    full = centroid_new[None] @ m @ centroid[None]
    inv = jnp.linalg.inv(full)

    if resample == "shear":
        from ..ops.shear_warp import warp_by_inverse
        assert size == new_size, "shear mode expects same-size warp"
        out = warp_by_inverse(voxels.astype(jnp.float32), inv)
        return out.astype(voxels.dtype)

    # homogeneous output grid, (x, y, z) over (W, H, D)
    zz, yy, xx = jnp.meshgrid(jnp.arange(new_size), jnp.arange(new_size),
                              jnp.arange(new_size), indexing="ij")
    out = _warp_resample(voxels, inv, (xx, yy, zz), new_size ** 3, resample)
    return out.reshape(b, new_size, new_size, new_size, voxels.shape[-1]
                       ).astype(voxels.dtype)


def _warp_resample(voxels, inv, xyz_grid, n, resample):
    xx, yy, zz = xyz_grid
    grid = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1),
                      jnp.ones(n)], axis=0).astype(jnp.float32)
    warped = inv @ grid[None]                      # (B, 4, N)
    coords = jnp.moveaxis(warped[:, :3, :], 1, 2)  # (B, N, 3) = (x, y, z)
    use_mxu = resample == "mxu" or (resample == "auto"
                                    and jax.default_backend() == "tpu")
    if use_mxu:
        # gathers serialise on TPU; the matmul formulation runs on the MXU
        from ..ops.pallas.trilinear import trilinear_resample_mxu
        return trilinear_resample_mxu(voxels.astype(jnp.float32), coords)
    return trilinear_resample(voxels.astype(jnp.float32), coords)


def rigid_transform_project(voxels: jax.Array, view: jax.Array,
                            size: int = 16, new_size: int = 16,
                            resample: str = "auto") -> jax.Array:
    """rigid_transform_volume fused with the projection unit's
    flip-depth + collapse-depth-into-channels (hologan_generator.py:130-133):
    the output GRID is ordered (y, x, z-flipped) so the resampled points land
    directly in the collapsed (B, H, W, D·C) layout — the separate flip /
    moveaxis / reshape data-formatting passes disappear from the hot path.
    Equality with the unfused pair is pinned in tests/test_hologan.py."""
    b = voxels.shape[0]
    m = _rigid_matrices(view)
    centroid = jnp.eye(4).at[:3, 3].set(-size * 0.5)
    centroid_new = jnp.eye(4).at[:3, 3].set(new_size * 0.5)
    inv = jnp.linalg.inv(centroid_new[None] @ m @ centroid[None])

    # grid ordered (y, x, k) with z = D-1-k (the reference's depth flip)
    yy, xx, kk = jnp.meshgrid(jnp.arange(new_size), jnp.arange(new_size),
                              jnp.arange(new_size), indexing="ij")
    zz = new_size - 1 - kk
    out = _warp_resample(voxels, inv, (xx, yy, zz), new_size ** 3, resample)
    return out.reshape(b, new_size, new_size,
                       new_size * voxels.shape[-1]).astype(voxels.dtype)


class GenBlock3D(nn.Module):
    out_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, z):
        h = nn.ConvTranspose(self.out_planes, (3, 3, 3), strides=(2, 2, 2),
                             padding="SAME", dtype=self.dtype,
                             kernel_init=conv_init)(h)
        s, b = ZMapping(self.out_planes, dtype=self.dtype)(z)
        return _adain_relu(h, s, b)


class GenBlock2D(nn.Module):
    out_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, z):
        h = nn.ConvTranspose(self.out_planes, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             kernel_init=conv_init)(h)
        s, b = ZMapping(self.out_planes, dtype=self.dtype)(z)
        return _adain_relu(h, s, b)


class Generator(nn.Module):
    in_planes: int
    out_planes: int
    z_planes: int
    view_args: Any
    img_size: int = 64
    #: volume resample mode — see rigid_transform_volume
    resample: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, view_in=None, train: bool = True):
        f = self.in_planes
        b = z.shape[0]
        z = z.astype(self.dtype)
        if view_in is None:
            view_in = sample_view(self.make_rng("view"), b, self.view_args)
        view_in = jnp.asarray(view_in, jnp.float32)

        # learned constant volume, init (randn-0.5)/0.5 as in the reference
        # (hologan_generator.py:49-51)
        const = self.param(
            "const",
            lambda k, shape: (jax.random.normal(k, shape) - 0.5) / 0.5,
            (1, 4, 4, 4, f * 8))
        x = jnp.broadcast_to(const, (b,) + const.shape[1:]).astype(self.dtype)

        s0, b0 = ZMapping(f * 8, dtype=self.dtype)(z)
        h = _adain_relu(x, s0, b0)
        h = GenBlock3D(f * 2, dtype=self.dtype)(h, z)    # 4³ → 8³
        h = GenBlock3D(f, dtype=self.dtype)(h, z)        # 8³ → 16³

        if self.resample == "shear":
            h = rigid_transform_volume(h, view_in, 16, 16,
                                       resample=self.resample)
            # projection unit: flip depth, collapse D into channels
            # (hologan_generator.py:130-133)
            h = h[:, ::-1]                               # flip depth axis
            h = jnp.moveaxis(h, 1, 3)                    # (B, H, W, D, C)
            h = h.reshape(b, 16, 16, 16 * f)
        else:
            # fused transform+flip+collapse (grid reorder — no formatting
            # passes between the resample kernel and the 1×1 conv)
            h = rigid_transform_project(h, view_in, 16, 16,
                                        resample=self.resample)

        h = nn.Conv(f * 16, (1, 1), dtype=self.dtype,
                    kernel_init=conv_init)(h)
        h = nn.relu(h)
        h = GenBlock2D(f * 4, dtype=self.dtype)(h, z)    # 16 → 32
        h = GenBlock2D(f, dtype=self.dtype)(h, z)        # 32 → 64
        if self.img_size == 128:
            h = nn.ConvTranspose(self.out_planes, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 kernel_init=conv_init)(h)
        else:
            h = nn.Conv(self.out_planes, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, kernel_init=conv_init)(h)
        return jnp.tanh(h)


class DiscBlock(nn.Module):
    """SpectralNorm Conv5x5-s2 + InstanceNorm(no affine) + LeakyReLU
    (hologan_discriminator.py:7-23)."""
    out_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .layers import SpectralNormConv
        h = SpectralNormConv(self.out_planes, (5, 5), strides=(2, 2),
                             padding=[(2, 2), (2, 2)], dtype=self.dtype)(x)
        # InstanceNorm2d default affine=False in torch
        mean = jnp.mean(h, axis=(1, 2), keepdims=True)
        var = jnp.var(h, axis=(1, 2), keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        return nn.leaky_relu(h.astype(self.dtype), 0.2)


class Discriminator(nn.Module):
    in_planes: int
    out_planes: int
    z_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.out_planes
        h = nn.Conv(f, (5, 5), strides=(2, 2), padding=[(2, 2), (2, 2)],
                    dtype=self.dtype, kernel_init=conv_init)(x)
        h = nn.leaky_relu(h, 0.2)
        h = DiscBlock(f * 2, dtype=self.dtype)(h)
        h = DiscBlock(f * 4, dtype=self.dtype)(h)
        h = DiscBlock(f * 8, dtype=self.dtype)(h)
        h = h.reshape(x.shape[0], -1)
        logit = nn.Dense(1, dtype=self.dtype, kernel_init=conv_init)(h)[:, 0]
        enc = nn.leaky_relu(nn.Dense(128, dtype=self.dtype,
                                     kernel_init=conv_init)(h), 0.2)
        z_pred = jnp.tanh(nn.Dense(self.z_planes, dtype=self.dtype,
                                   kernel_init=conv_init)(enc))
        return logit, z_pred
