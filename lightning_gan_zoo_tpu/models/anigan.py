"""ANIGAN generator: π-GAN with a mesh-guided deformer and single-shape
SIREN (reference core/models/anigan.py:6-28).

The deformer is instantiated from the composed ``nerf.deformer`` node; the
SIREN input width comes from the deformer (45 = 3 coords × 15 keypoints for
the displacement path — the reference hardcodes 45 at anigan.py:28)."""
from __future__ import annotations

import jax.numpy as jnp

from ..config.registry import instantiate
from .pigan import Generator


def make_generator(channels_noise, channels_img, features_g, nerf_cfg,
                   view_args, img_size=64, dtype=jnp.float32, **_ignored):
    deformer = instantiate(nerf_cfg["deformer"])
    return Generator(
        channels_noise=int(channels_noise),
        channels_img=int(channels_img),
        features_g=int(features_g),
        nerf_cfg=nerf_cfg,
        view_args=view_args,
        img_size=int(img_size),
        deformer=deformer,
        siren_input_channels=int(deformer.siren_input_channels),
        dtype=dtype,
    )
