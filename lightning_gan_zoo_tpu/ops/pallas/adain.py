"""Pallas TPU kernel: fused instance-norm + affine + activation epilogue.

HoloGAN's generator interleaves AdaIN(z) + ReLU after every ConvTranspose
(reference core/models/hologan_generator.py:333-345 applies AdaIN's
per-sample spatial statistics, then an external (scale, bias) from the
z-mapping, then ReLU at :55-66); the discriminator runs InstanceNorm
(affine=False) + LeakyReLU after every spectral-norm conv
(hologan_discriminator.py:7-23). Trace-measured, these chains are ~10% of
the hologan superstep (ROADMAP.md): XLA lowers them as a reduction fusion
(one read of the conv output for mean+var) plus an elementwise fusion
(another read + the write), i.e. 2 reads + 1 write of the feature map —
and the backward re-reads everything again for the three reduction terms.

THE KERNEL: one grid instance per sample holds the WHOLE (S, C) feature
map in VMEM (hologan's largest is 64²×64 = 1 MB f32), computes μ/σ² both
spatial reductions, normalises, applies the per-sample (scale, bias) and
the activation, and writes — 1 read + 1 write. The hand-written backward
recomputes the statistics in-VMEM from x (no residuals in HBM) and emits
dx, dscale, dbias in a single read of (x, g):

    y  = (x − μ)·r,  r = rsqrt(σ² + eps)
    gp = g · act'(y·s + b),   gy = gp · s
    dx = r · (gy − mean_S(gy) − y · mean_S(gy·y))
    ds = Σ_S gp·y,   db = Σ_S gp

slope selects the activation: 0.0 = ReLU (generator), 0.2 = LeakyReLU
(discriminator). Statistics and the normalisation run in f32 regardless of
the storage dtype (the bf16 policy casts activations only; the plain path
computes in compute-dtype, so parity tests compare at bf16 tolerance).

First-order custom_vjp only: HoloGAN's BCE loss never differentiates the
backward (no gradient penalty in this family).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: VMEM budget guard: the backward holds ~6 f32 copies of the (S, C) map.
_MAX_ELEMS = 512 * 1024


def eligible(spatial: int, channels: int) -> bool:
    """Shapes the fused epilogue supports: whole-sample VMEM residency and
    sublane-aligned spatial extent."""
    return (spatial % 8 == 0 and channels % 8 == 0
            and spatial * channels <= _MAX_ELEMS and spatial >= 64)


def _act(pre, slope: float):
    if slope == 0.0:
        return jnp.maximum(pre, 0.0)
    return jnp.where(pre >= 0, pre, slope * pre)


def _stats(x):
    mu = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mu
    var = jnp.mean(jnp.square(xc), axis=0, keepdims=True)
    return xc, var


def _fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, eps, slope):
    x = x_ref[0].astype(jnp.float32)                     # (S, C)
    xc, var = _stats(x)
    y = xc * jax.lax.rsqrt(var + eps)
    pre = y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    o_ref[0] = _act(pre, slope).astype(o_ref.dtype)


def _bwd_kernel(x_ref, s_ref, b_ref, g_ref, dx_ref, ds_ref, db_ref, *,
                eps, slope):
    x = x_ref[0].astype(jnp.float32)
    s = s_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    xc, var = _stats(x)
    r = jax.lax.rsqrt(var + eps)
    y = xc * r
    pre = y * s + b_ref[0].astype(jnp.float32)
    dact = jnp.where(pre >= 0, 1.0, slope)
    gp = g * dact
    ds_ref[0] = jnp.sum(gp * y, axis=0, keepdims=True).astype(ds_ref.dtype)
    db_ref[0] = jnp.sum(gp, axis=0, keepdims=True).astype(db_ref.dtype)
    gy = gp * s
    m1 = jnp.mean(gy, axis=0, keepdims=True)
    m2 = jnp.mean(gy * y, axis=0, keepdims=True)
    dx_ref[0] = (r * (gy - m1 - y * m2)).astype(dx_ref.dtype)


def _flatten(x):
    b, c = x.shape[0], x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    return x.reshape(b, s, c), s, c


def _row_spec(s, c):
    return pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _vec_spec(c):
    # scale/bias ride as (B, 1, C) so the block's last two dims (1, C)
    # equal the array dims — Mosaic requires trailing block dims to be
    # (8, 128)-divisible or array-equal, and a (1, C) block over (B, C)
    # violates the sublane rule whenever B > 1 (caught on real TPU;
    # interpret mode doesn't check it).
    return pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd(xf, scale, bias, eps, slope, interpret):
    """Flattened-core forward: xf is (B, S, C)."""
    _, s, c = xf.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, slope=slope),
        grid=(xf.shape[0],),
        in_specs=[_row_spec(s, c), _vec_spec(c), _vec_spec(c)],
        out_specs=_row_spec(s, c),
        out_shape=jax.ShapeDtypeStruct(xf.shape, xf.dtype),
        interpret=interpret,
    )(xf, scale[:, None, :], bias[:, None, :])


def _bwd(xf, scale, bias, gf, eps, slope, interpret):
    """Flattened-core backward: xf/gf are (B, S, C)."""
    b, s, c = xf.shape
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, slope=slope),
        grid=(b,),
        in_specs=[_row_spec(s, c), _vec_spec(c), _vec_spec(c),
                  _row_spec(s, c)],
        out_specs=[_row_spec(s, c), _vec_spec(c), _vec_spec(c)],
        out_shape=[jax.ShapeDtypeStruct(xf.shape, xf.dtype),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)],
        interpret=interpret,
    )(xf, scale[:, None, :], bias[:, None, :], gf)
    return dx, ds[:, 0], db[:, 0]


def _fwd_sharded(x, scale, bias, eps, slope, interpret):
    # batch-partitioned under a mesh (parallel/kernel_sharding.py): each
    # chip runs the kernel on its local batch shard — no all-gather
    from ...parallel.kernel_sharding import batch_partitioned
    xf, _, _ = _flatten(x)
    y = batch_partitioned(
        _fwd, "b s c, b c, b c -> b s c",
        statics=(eps, slope, interpret))(xf, scale, bias)
    return y.reshape(x.shape)


def _bwd_sharded(x, scale, bias, g, eps, slope, interpret):
    from ...parallel.kernel_sharding import batch_partitioned
    xf, _, _ = _flatten(x)
    dx, ds, db = batch_partitioned(
        _bwd, "b s c, b c, b c, b s c -> b s c, b c, b c",
        statics=(eps, slope, interpret))(xf, scale, bias,
                                         g.reshape(xf.shape))
    return (dx.reshape(x.shape), ds.astype(scale.dtype),
            db.astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_adain_act(x, scale, bias, eps=1e-5, slope=0.0, interpret=False):
    """act((x − μ_S)·rsqrt(σ²_S + eps) · scale + bias) as ONE fused kernel.

    x: (B, *spatial, C); scale/bias: (B, C) — per-sample affine from a
    z-mapping (pass ones/zeros for a plain non-affine InstanceNorm).
    slope = LeakyReLU negative slope (0.0 → ReLU).
    """
    return _fwd_sharded(x, scale, bias, eps, slope, interpret)


def _vjp_fwd(x, scale, bias, eps, slope, interpret):
    return _fwd_sharded(x, scale, bias, eps, slope, interpret), \
        (x, scale, bias)


def _vjp_bwd(eps, slope, interpret, res, g):
    x, scale, bias = res
    return _bwd_sharded(x, scale, bias, g, eps, slope, interpret)


fused_adain_act.defvjp(_vjp_fwd, _vjp_bwd)


def plain_adain_act(x, scale, bias, eps=1e-5, slope=0.0):
    """Reference XLA implementation (f32 statistics, same contract)."""
    xf = x.astype(jnp.float32)
    spatial_axes = tuple(range(1, x.ndim - 1))
    mu = jnp.mean(xf, axis=spatial_axes, keepdims=True)
    var = jnp.var(xf, axis=spatial_axes, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    pre = (y * scale.astype(jnp.float32).reshape(bshape)
           + bias.astype(jnp.float32).reshape(bshape))
    return _act(pre, slope).astype(x.dtype)
