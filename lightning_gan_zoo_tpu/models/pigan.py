"""π-GAN: SIREN-NeRF generator + progressive CoordConv discriminator.

Reference: /root/reference/core/models/pigan.py. TPU-first notes:

  * the generator samples azimuth-only orthographic cameras ON DEVICE from a
    'view' RNG stream (replacing host numpy at pigan.py:57-58) and renders
    all rays in one fused pass (see nerf/renderer.py).
  * ``sample_res`` is a static Python int — each training resolution is its
    own compiled shape bucket (SURVEY §7.3 item 3); the annealing schedule
    changes it at epoch boundaries only.
  * the progressive discriminator's ``resolution`` is likewise static per
    bucket, while the fade-in ``alpha`` stays a traced scalar carried in
    TrainState.extra (replacing the torch buffers at pigan.py:162-177).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nerf.cameras import OrthographicCameras, look_at_view_transform
from ..nerf.renderer import RadianceFieldRenderer
from ..nerf.sampling import sample_full_xys
from .layers import CoordConv, avg_pool2, conv_init


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def sample_pigan_view(rng: jax.Array, batch_size: int, azimuth_low: float,
                      azimuth_high: float) -> jax.Array:
    """Integer-degree azimuth sample, elevation 0 (pigan.py:57-58), returned
    as a 6-dof view row compatible with pose_to_cameras."""
    az = jax.random.randint(rng, (batch_size,), int(azimuth_low),
                            max(int(azimuth_high), int(azimuth_low) + 1)
                            ).astype(jnp.float32)
    zeros = jnp.zeros((batch_size,))
    return jnp.stack([jnp.deg2rad(az), zeros, jnp.ones((batch_size,)),
                      zeros, zeros, zeros], axis=1)


class Generator(nn.Module):
    channels_noise: int
    channels_img: int
    features_g: int
    nerf_cfg: Any          # mapping with the conf `nerf:` keys
    view_args: Any         # azimuth_low/high, elevation_*, camera_dist
    img_size: int = 64
    deformer: Optional[nn.Module] = None
    siren_input_channels: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        nc = self.nerf_cfg
        self.nerf_renderer = RadianceFieldRenderer(
            n_pts_per_ray=int(nc["n_pts_per_ray"]),
            n_pts_per_ray_fine=int(nc["n_pts_per_ray_fine"]),
            min_depth=float(nc["min_depth"]),
            max_depth=float(nc["max_depth"]),
            stratified=bool(nc["stratified"]),
            stratified_test=bool(nc["stratified_test"]),
            chunk_size=int(nc["chunk_size"]),
            latent_z_dim=int(nc["latent_z_dim"]),
            siren_dim_hidden=int(nc["siren_dim_hidden"]),
            siren_num_layers=int(nc["siren_num_layers"]),
            density_noise_std=float(nc.get("density_noise_std", 0.0)
                                    if hasattr(nc, "get")
                                    else nc["density_noise_std"]),
            white_bg=bool(nc["white_bg"]),
            single_shape=bool(nc["single_shape"]),
            deformer=self.deformer,
            siren_input_channels=self.siren_input_channels,
            remat=bool(nc.get("remat", False) if hasattr(nc, "get")
                       else False),
            dtype=self.dtype,
        )

    @property
    def camera_dist(self):
        return float(self.view_args["camera_dist"])

    def pose_to_cameras(self, view_in) -> OrthographicCameras:
        """6-dof pose rows → azimuth-only orbit cameras (pigan.py:42-53)."""
        az_deg = jnp.rad2deg(view_in[:, 0])
        elev = jnp.zeros_like(az_deg)
        return look_at_view_transform(self.camera_dist, elev, az_deg)

    def __call__(self, z, sample_res: Optional[int] = None, cameras=None,
                 view_in=None, ray_scale=None, deformation_parameters=None,
                 deformed_verts=None, mean_shape_verts=None, kp_verts=None,
                 train: bool = True):
        if sample_res is None:
            sample_res = self.img_size
        b = z.shape[0]
        rays_xy = sample_full_xys(b, int(sample_res))
        if ray_scale is not None:
            rays_xy = rays_xy / ray_scale[:, None, None, None]

        if cameras is None:
            if view_in is not None:
                cameras = self.pose_to_cameras(jnp.asarray(view_in))
            else:
                view = sample_pigan_view(
                    self.make_rng("view"), b,
                    self.view_args["azimuth_low"],
                    self.view_args["azimuth_high"])
                cameras = self.pose_to_cameras(view)

        return self.nerf_renderer(
            z, cameras, rays_xy, train=train,
            deformation_parameters=deformation_parameters,
            deformed_verts=deformed_verts,
            mean_shape_verts=mean_shape_verts, kp_verts=kp_verts)

    def calculate_deformation(self, shape_analysis):
        """Delegate to the deformer (reference generator.deformer access at
        lightning_module.py:344); call via apply(method=...)."""
        return self.deformer.calculate_deformation(shape_analysis)


def make_generator(channels_noise, channels_img, features_g, nerf_cfg,
                   view_args, img_size=64, dtype=jnp.float32, **_ignored):
    return Generator(channels_noise=int(channels_noise),
                     channels_img=int(channels_img),
                     features_g=int(features_g), nerf_cfg=nerf_cfg,
                     view_args=view_args, img_size=int(img_size),
                     dtype=dtype)


# ---------------------------------------------------------------------------
# Progressive discriminator
# ---------------------------------------------------------------------------

class DiscriminatorBlock(nn.Module):
    """CoordConv3x3 ×2 + AvgPool, 1×1-s2 CoordConv residual
    (pigan.py:92-111)."""
    dim_out: int
    dtype: Any = jnp.float32

    def setup(self):
        self.res = CoordConv(self.dim_out, kernel_size=(1, 1),
                             strides=(2, 2), dtype=self.dtype)
        self.conv1 = CoordConv(self.dim_out, kernel_size=(3, 3),
                               padding=[(1, 1), (1, 1)], dtype=self.dtype)
        self.conv2 = CoordConv(self.dim_out, kernel_size=(3, 3),
                               padding=[(1, 1), (1, 1)], dtype=self.dtype)

    def __call__(self, x):
        res = self.res(x)
        h = nn.leaky_relu(self.conv1(x), 0.2)
        h = nn.leaky_relu(self.conv2(h), 0.2)
        return avg_pool2(h) + res


class Discriminator(nn.Module):
    """Progressive-growing CoordConv ResNet (pigan.py:113-198).

    ``current_res`` (static) selects the entry point; ``alpha`` (traced)
    fades in the freshly added from_rgb path: at the block one level below
    the entry, x ← x·(1−α) + from_rgb(img↓2)·α (pigan.py:189-191).
    """
    img_size: int
    init_chan: int = 64
    max_chan: int = 400
    init_resolution: int = 32
    add_layer_iters: int = 10000
    final_sigmoid: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        res_log = math.log2(self.img_size)
        assert res_log.is_integer(), "image size must be a power of 2"
        assert math.log2(self.init_resolution).is_integer()
        layers = int(res_log) - 1
        chans = list(reversed([2 ** (11 - t) for t in range(layers)]))
        chans = [min(self.max_chan, c) for c in chans]
        chans = [self.init_chan, *chans]
        self.resolutions = [2 ** (int(res_log) - t) for t in range(layers)]
        self.from_rgbs = [
            (CoordConv(in_c, kernel_size=(1, 1), dtype=self.dtype,
                       name=f"from_rgb_{r}")
             if r >= self.init_resolution else None)
            for r, in_c in zip(self.resolutions, chans[:-1])]
        self.blocks = [DiscriminatorBlock(out_c, dtype=self.dtype,
                                          name=f"block_{r}")
                       for r, out_c in zip(self.resolutions, chans[1:])]
        self.final_conv = CoordConv(1, kernel_size=(2, 2), padding="VALID",
                                    dtype=self.dtype, name="final_conv")

    def __call__(self, img, alpha=0.0, current_res: Optional[int] = None,
                 train: bool = True):
        if current_res is None:
            current_res = img.shape[1]
        alpha = jnp.asarray(alpha, jnp.float32)

        if self.is_initializing():
            # touch every layer (all from_rgb entries AND all blocks) so the
            # full progressive param tree exists before any growth step —
            # flax creates params lazily, but growth must not add params
            # mid-training (optimizer state shape would change)
            for r, frgb in zip(self.resolutions, self.from_rgbs):
                if frgb is not None and r != current_res:
                    frgb(jnp.zeros((1, r, r, img.shape[-1]), img.dtype))
            if current_res != self.img_size:
                h = jnp.zeros((1, self.img_size, self.img_size,
                               img.shape[-1]), img.dtype)
                h = nn.leaky_relu(self.from_rgbs[0](h), 0.2)
                for blk in self.blocks:
                    h = blk(h)
                self.final_conv(h)

        x = img
        for r, frgb, block in zip(self.resolutions, self.from_rgbs,
                                  self.blocks):
            if current_res < r:
                continue
            if current_res == r:
                x = nn.leaky_relu(frgb(x), 0.2)
            if r == current_res // 2 and frgb is not None:
                down = img[:, ::2, ::2, :]  # F.interpolate(scale=0.5) nearest
                x = x * (1.0 - alpha) + \
                    nn.leaky_relu(frgb(down), 0.2) * alpha
            x = block(x)

        out = self.final_conv(x)
        out = out.reshape(img.shape[0], -1)[:, 0]
        if self.final_sigmoid:
            out = nn.sigmoid(out)
        return out
