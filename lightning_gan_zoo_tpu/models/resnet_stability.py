"""ResNet G/D for the R1-regularised GAN (expt gan_stability_r1).

Topology mirrors /root/reference/core/submodules/gan_stability/models/resnet.py:
pre-activation LeakyReLU(0.2) ResNet blocks with a 0.1-scaled residual
(resnet.py:120), nearest ×2 upsampling in G, AvgPool(3, s2, p1) downsampling in
D, channel schedule min(nf·2^k, nf_max), 4×4 base resolution, and — kept
faithfully — D's final sigmoid baked into the network (resnet.py:82,93) even
though the training loss is BCE-with-logits.

NHWC / XLA convs / bf16-compatible. With nfilter=16 (the reference config)
the high-resolution levels run 16/32-channel convs below the MXU lane
ceiling; four lane-packing reformulations were built, parity-tested and
benchmarked (ops/lane_pack.py docstring has the numbers) — every one REGRESSED
the end-to-end superstep despite isolated-op wins, so ``lane_pack`` defaults
to False (plain XLA convs) and the packed forms remain tested opt-ins.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.lane_pack import LaneConv
from .layers import avg_pool_mxu, conv_init, upsample2_nearest


def actvn(x):
    return nn.leaky_relu(x, 0.2)


class ResnetBlock(nn.Module):
    """Pre-activation block, out = shortcut + 0.1·conv(act(conv(act(x)))).

    Measurement note (round 5, v5e hardware): a whole-block fused Pallas
    kernel (conv+leaky+conv per kernel instance, group-packed layout,
    hand-written backward, R1 grad-of-grad via a plain-XLA twin) was
    built for the lane-starved (≤64-channel) levels, hardware-validated
    for correctness (fwd+bwd parity at tiny and 128px production shapes),
    then A/B'd on the full gan_stability_r1 superstep — it REGRESSED
    heavily: 34.02 ms/superstep fused vs 18.87 ms plain (MFU 4.7% vs
    12.5%). Same verdict as the four lane-packing reformulations
    (ops/lane_pack.py): XLA's whole-graph fusion beats local lane fixes,
    and the custom-VJP boundary fences it. The kernel was deleted
    (see BASELINE.md "kernel verdicts")."""
    fout: int
    fhidden: Optional[int] = None
    is_bias: bool = True
    dtype: Any = jnp.float32
    lane_pack: bool = False

    @nn.compact
    def __call__(self, x):
        fin = x.shape[-1]
        fhidden = self.fhidden if self.fhidden is not None else min(fin, self.fout)
        if fin != self.fout:
            x_s = LaneConv(self.fout, (1, 1), use_bias=False, dtype=self.dtype,
                           kernel_init=conv_init, enabled=self.lane_pack,
                           name="conv_s")(x)
        else:
            x_s = x

        dx = LaneConv(fhidden, (3, 3), dtype=self.dtype,
                      kernel_init=conv_init, enabled=self.lane_pack,
                      name="conv_0")(actvn(x))
        dx = LaneConv(self.fout, (3, 3), use_bias=self.is_bias,
                      dtype=self.dtype, kernel_init=conv_init,
                      enabled=self.lane_pack, name="conv_1")(actvn(dx))
        return x_s + 0.1 * dx


class Generator(nn.Module):
    z_dim: int
    size: int
    nlabels: int = 1
    embed_size: int = 256
    nfilter: int = 64
    nfilter_max: int = 512
    dtype: Any = jnp.float32
    lane_pack: bool = False

    @nn.compact
    def __call__(self, z, train: bool = True):
        s0 = 4
        nf, nf_max = self.nfilter, self.nfilter_max
        nlayers = int(math.log2(self.size / s0))
        nf0 = min(nf_max, nf * 2 ** nlayers)

        h = nn.Dense(nf0 * s0 * s0, dtype=self.dtype)(z.astype(self.dtype))
        h = h.reshape(z.shape[0], s0, s0, nf0)
        for i in range(nlayers):
            f_out = min(nf * 2 ** (nlayers - i - 1), nf_max)
            h = ResnetBlock(fout=f_out, dtype=self.dtype,
                            lane_pack=self.lane_pack)(h)
            h = upsample2_nearest(h)
        h = ResnetBlock(fout=nf, dtype=self.dtype,
                        lane_pack=self.lane_pack)(h)
        h = LaneConv(3, (3, 3), dtype=self.dtype, kernel_init=conv_init,
                     enabled=self.lane_pack, name="conv_img")(actvn(h))
        return jnp.tanh(h)


class Discriminator(nn.Module):
    z_dim: int
    size: int
    nlabels: int = 1
    embed_size: int = 256
    nfilter: int = 64
    nfilter_max: int = 1024
    final_sigmoid: bool = True
    dtype: Any = jnp.float32
    lane_pack: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        s0 = 4
        nf, nf_max = self.nfilter, self.nfilter_max
        nlayers = int(math.log2(self.size / s0))

        h = LaneConv(nf, (3, 3), dtype=self.dtype, kernel_init=conv_init,
                     enabled=self.lane_pack,
                     name="conv_img")(x.astype(self.dtype))
        h = ResnetBlock(fout=nf, dtype=self.dtype,
                        lane_pack=self.lane_pack)(h)
        for i in range(nlayers):
            f_out = min(nf * 2 ** (i + 1), nf_max)
            # torch AvgPool2d(3, stride=2, padding=1), as an MXU conv
            # (reduce-window pooling measured at 14% of the superstep)
            h = avg_pool_mxu(h, window=3, stride=2, pad=1)
            h = ResnetBlock(fout=f_out, dtype=self.dtype,
                            lane_pack=self.lane_pack)(h)
        h = h.reshape(x.shape[0], -1)
        out = nn.Dense(self.nlabels, dtype=self.dtype)(actvn(h))
        out = out[:, 0]
        if self.final_sigmoid:
            out = nn.sigmoid(out)
        return out
