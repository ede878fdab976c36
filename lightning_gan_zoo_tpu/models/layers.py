"""Shared building blocks for the model zoo (flax.linen, NHWC layout).

TPU-first conventions used throughout the zoo:
  * images are NHWC (XLA's native TPU conv layout), not the reference's NCHW
  * modules carry a ``dtype`` (compute) attribute; params stay float32
    (``param_dtype``) — the bf16 policy casts activations only
  * normalisation matches the reference's torch semantics:
    BatchNorm(momentum .1 torch == .9 flax, eps 1e-5), InstanceNorm(affine,
    no running stats) as channel-wise GroupNorm
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# DCGAN-style init (normal std 0.02). The reference leaves its init_weights
# application commented out (core/lightning_module.py:51-52) and trains with
# torch defaults; we default to normal(0.02) — the published DCGAN recipe —
# which keeps early training stable at bf16.
conv_init = nn.initializers.normal(stddev=0.02)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True, track_running_stats=False) equivalent."""
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Normalise over spatial dims only, per sample, per channel (NHWC).
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (y * scale + bias).astype(self.dtype)


def make_norm(kind: str, dtype: Dtype, train: bool):
    """Factory for the D/G norm choice ('batch_norm' | 'instance_norm2d' |
    'identity') — reference standard_networks.py:44-48."""
    if kind == "batch_norm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=dtype)
    if kind == "instance_norm2d":
        return InstanceNorm(dtype=dtype)
    if kind in ("identity", "none", None):
        return lambda x: x
    raise ValueError(f"Unknown norm: {kind!r}")


class AdaIN(nn.Module):
    """Adaptive instance norm: normalise per-instance then apply an external
    (scale, bias) pair from a z-mapping (reference hologan_generator.py:333-345).

    Works for both 2D (NHWC) and 3D (NDHWC) feature maps: statistics are taken
    over all spatial dims.
    """
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale, bias):
        spatial_axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=spatial_axes, keepdims=True)
        var = jnp.var(x, axis=spatial_axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        # scale/bias: (N, C) → broadcast over spatial dims
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        return (y * scale.reshape(bshape) + bias.reshape(bshape)).astype(self.dtype)


class ZMapping(nn.Module):
    """z → (scale, bias) for one AdaIN stage (hologan_generator.py:7-18)."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        h = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                     kernel_init=conv_init)(z)
        h = nn.leaky_relu(h, 0.2)
        return h[:, :self.out_channels], h[:, self.out_channels:]


class AddCoords(nn.Module):
    """Append normalised x/y (+ optional radius) channels (coordconv.py:7-41)."""
    with_r: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        ys = jnp.linspace(-1.0, 1.0, h, dtype=self.dtype)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=self.dtype)
        yy = jnp.broadcast_to(ys[:, None], (h, w))
        xx = jnp.broadcast_to(xs[None, :], (h, w))
        coords = jnp.stack([xx, yy], axis=-1)
        if self.with_r:
            rr = jnp.sqrt(jnp.square(xx) + jnp.square(yy))[..., None]
            coords = jnp.concatenate([coords, rr], axis=-1)
        coords = jnp.broadcast_to(coords[None], (n,) + coords.shape)
        return jnp.concatenate([x, coords.astype(x.dtype)], axis=-1)


class CoordConv(nn.Module):
    """Conv2d preceded by coordinate channels (coordconv.py:44-57)."""
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    with_r: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = AddCoords(with_r=self.with_r, dtype=self.dtype)(x)
        return nn.Conv(self.features, tuple(self.kernel_size),
                       strides=tuple(self.strides), padding=self.padding,
                       use_bias=self.use_bias, dtype=self.dtype,
                       kernel_init=conv_init)(x)


class SpectralNormConv(nn.Module):
    """Conv2d with spectral normalisation by one power-iteration step per call
    (reference wraps torch.nn.utils.spectral_norm around D convs,
    hologan_discriminator.py:15-39).

    The u vector persists in the 'spectral' variable collection and is updated
    once per forward in training mode (torch semantics). The estimate
    σ = uᵀ W v normalises the kernel.
    """
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    update_stats: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        kernel = self.param("kernel", conv_init, kshape, jnp.float32)
        w = kernel.reshape(-1, self.features)  # (fan_in, out)
        u_var = self.variable(
            "spectral", "u",
            lambda: jnp.full((self.features,), 1.0 / jnp.sqrt(self.features),
                             jnp.float32))
        u = u_var.value
        # one power-iteration step (torch.nn.utils.spectral_norm default n=1)
        v = w @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        if self.update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        # torch.nn.utils.spectral_norm semantics: u/v are detached buffers,
        # but sigma = vᵀWu keeps the explicit W dependency, so gradients
        # carry the −W·∂σ/∂W/σ² term (hologan_discriminator.py:15 wraps it).
        sigma = jax.lax.stop_gradient(v) @ (w @ jax.lax.stop_gradient(u_new))
        kernel_sn = kernel / sigma
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel_sn.astype(self.dtype),
            window_strides=tuple(self.strides),
            padding=self.padding if isinstance(self.padding, str)
            else [tuple(p) for p in self.padding],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def avg_pool2(x):
    """2×2 average pooling, stride 2 (torch AvgPool2d(2) / F.avg_pool2d)."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def avg_pool_mxu(x, window: int = 3, stride: int = 2, pad: int = 1):
    """Average pooling as a diagonal-kernel dense conv on the MXU.

    XLA lowers reduce-window pooling to the VPU; at the R1 config's shapes
    the five AvgPool(3,s2,p1) stages cost 14% of the whole superstep
    (trace-measured, tools/profile_superstep.py). The identical math as a
    stride-2 conv with W[u,v,ci,co] = δ(ci,co)/window² is ~1% of model FLOPs
    and rides the MXU. count_include_pad=True semantics (zero pads count in
    the divisor) match torch AvgPool2d(3,2,1) — reference resnet.py:74-80.
    """
    c = x.shape[-1]
    eye = jnp.eye(c, dtype=x.dtype) / float(window * window)
    kernel = jnp.broadcast_to(eye, (window, window, c, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def upsample2_nearest(x):
    """Nearest-neighbour ×2 upsample (torch nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)
