"""DCGAN-family generator/discriminator (used by dc_gan, wgan, wgan_gp).

Topology matches the reference size-generic conv stacks
(/root/reference/core/models/standard_networks.py:9-93):

  D: Conv4x4-s2 stem (no norm) + LeakyReLU(0.2), then log2(img/8) blocks of
     [Conv4x4-s2 (no bias) → norm → LeakyReLU(0.2)] doubling channels, then a
     4x4 valid conv to a 1x1 logit (optional sigmoid).
  G: z → 1×1 spatially, ConvT4x4-valid to 4×4, then log2(img/4)-1 blocks of
     [ConvT4x4-s2 → BN → ReLU] halving channels, final ConvT4x4-s2 to image
     channels + tanh.

TPU-native: NHWC layout, XLA convolutions (MXU), bf16 compute dtype under the
precision-16 policy with float32 params.
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv_init, make_norm


class Discriminator(nn.Module):
    channels_img: int
    features_d: int
    norm: str = "batch_norm"
    img_size: int = 64
    final_sigmoid: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n_blocks = int(math.log2(self.img_size // 8))
        h = nn.Conv(self.features_d, (4, 4), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, kernel_init=conv_init)(x)
        h = nn.leaky_relu(h, 0.2)
        for i in range(1, n_blocks + 1):
            h = nn.Conv(self.features_d * (2 ** i), (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, kernel_init=conv_init)(h)
            h = make_norm(self.norm, self.dtype, train)(h)
            h = nn.leaky_relu(h, 0.2)
        # 4×4 → 1×1 logit head
        h = nn.Conv(1, (4, 4), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=self.dtype, kernel_init=conv_init)(h)
        out = h.reshape(h.shape[0], -1)[:, 0]
        if self.final_sigmoid:
            out = nn.sigmoid(out)
        return out


class Generator(nn.Module):
    channels_noise: int
    channels_img: int
    features_g: int
    img_size: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        n_blocks = int(math.log2(self.img_size / 4))
        h = z.astype(self.dtype).reshape(z.shape[0], 1, 1, z.shape[-1])
        # stem: 1×1 → 4×4 at features_g * 2^n_blocks channels
        h = nn.ConvTranspose(self.features_g * (2 ** n_blocks), (4, 4),
                             strides=(1, 1), padding="VALID", use_bias=False,
                             dtype=self.dtype, kernel_init=conv_init)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(h)
        h = nn.relu(h)
        # upsampling blocks: channels 2^n_blocks → ... → 2
        for b in range(n_blocks, 1, -1):
            h = nn.ConvTranspose(self.features_g * (2 ** (b - 1)), (4, 4),
                                 strides=(2, 2), padding="SAME", use_bias=False,
                                 dtype=self.dtype, kernel_init=conv_init)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(h)
            h = nn.relu(h)
        h = nn.ConvTranspose(self.channels_img, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             dtype=self.dtype, kernel_init=conv_init)(h)
        return jnp.tanh(h)
