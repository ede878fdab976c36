"""Pallas TPU kernel: trilinear volume resampling on the MXU.

The HoloGAN hot op (SURVEY §2.6 "custom Pallas grid-sample kernel"): resample
a (B, D, H, W, C) feature volume at (B, N, 3) continuous points. The XLA
fallback (ops/grid_sample.trilinear_resample) issues 8 dynamic gathers per
point — gathers serialise on the TPU's scalar/vector units. This kernel
reformulates the interpolation as a *tensor-product one-hot matmul*:

    out[n, c] = Σ_{d,h,w} wz[n,d] · wy[n,h] · wx[n,w] · vox[d,h,w,c]

where the per-axis weights are hat functions w[n,k] = max(0, 1 − |p_n − k|)
of the (border-clamped) sample coordinate — identical math to 8-corner
trilinear interpolation, but expressed as a dense (TILE_N, D·H·W) @
(D·H·W, C) matmul that runs on the MXU at full tilt. For HoloGAN's 16³×64
volumes the extra FLOPs are trivial against MXU throughput while removing
every gather from the hot path.

Measured on v5e (B=32, 16³×64, 4096 pts): 3.6 ms forward / 5.5 ms
fwd+bwd — the XLA dynamic-gather formulation of the same op fails to even
compile on this TPU stack. A shear-decomposition alternative
(ops/shear_warp.py) with ~256× fewer dense-equivalent FLOPs was built and
measured 5× SLOWER (19.9 ms fwd): its tiny batched (16,16)@(16,64) matmuls
and rot90 axis permutes starve the MXU — an instructive confirmation that
on TPU, big well-shaped matmuls beat algorithmically-leaner small ones.

Differentiation: custom VJP. The cotangent flows to the VOLUME only
(d_vox = Σ_tiles wᵀ @ g, same kernel structure); the sample coordinates get
zero gradient — in HoloGAN they derive from the randomly *sampled* view, not
from parameters (hologan_generator.py:119), so no gradient is needed. The
XLA fallback keeps full coordinate gradients for any future caller that
wants them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _axis_weights(p, size):
    """Hat-function weights (TILE, size) for border-clamped coordinates."""
    pc = jnp.clip(p, 0.0, size - 1.0)
    # Mosaic only permits integer iota; cast to float after
    k = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], size), 1
                                 ).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pc[:, None] - k))


def _expanders(d, h, w):
    """Constant one-hot expansion matrices (axis-size, D·H·W) mapping
    per-axis weights onto the flat voxel index v = (z·H + y)·W + x. Mosaic
    only handles ≤2-D vector shapes comfortably, so the tensor-product
    weight build becomes three tiny matmuls + elementwise products."""
    n = d * h * w
    col_z = jax.lax.broadcasted_iota(jnp.int32, (d, n), 1) // (h * w)
    row_z = jax.lax.broadcasted_iota(jnp.int32, (d, n), 0)
    col_y = (jax.lax.broadcasted_iota(jnp.int32, (h, n), 1) // w) % h
    row_y = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0)
    col_x = jax.lax.broadcasted_iota(jnp.int32, (w, n), 1) % w
    row_x = jax.lax.broadcasted_iota(jnp.int32, (w, n), 0)
    ez = (col_z == row_z).astype(jnp.bfloat16)
    ey = (col_y == row_y).astype(jnp.bfloat16)
    ex = (col_x == row_x).astype(jnp.bfloat16)
    return ez, ey, ex


def _build_weights_direct(coords_ref, d, h, w):
    """Weight build without the expander matmuls: decode the flat voxel
    index per lane with bit ops (d, h, w are powers of two) and evaluate the
    three hat factors directly on the VPU."""
    assert d & (d - 1) == 0 and h & (h - 1) == 0 and w & (w - 1) == 0
    x = coords_ref[0, 0, :]
    y = coords_ref[0, 1, :]
    z = coords_ref[0, 2, :]
    n = d * h * w
    t = x.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    jx = (j & (w - 1)).astype(jnp.float32)
    jy = ((j >> w.bit_length() - 1) & (h - 1)).astype(jnp.float32)
    jz = (j >> (w.bit_length() - 1 + h.bit_length() - 1)).astype(jnp.float32)

    def hat(p, size, k):
        pc = jnp.clip(p, 0.0, size - 1.0)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pc[:, None] - k))

    wgt = hat(x, w, jx) * hat(y, h, jy) * hat(z, d, jz)
    return wgt.astype(jnp.bfloat16)


def _build_weights(coords_ref, d, h, w):
    """(T, D·H·W) trilinear weights in bf16.

    Power-of-two volumes take the VPU-direct bit-decode path (measured 29%
    faster end-to-end than the expander matmuls on v5e: 2.5 ms vs 3.5 ms
    forward at HoloGAN shape); other sizes use one-hot expansion matmuls."""
    if (d & (d - 1)) == 0 and (h & (h - 1)) == 0 and (w & (w - 1)) == 0:
        return _build_weights_direct(coords_ref, d, h, w)
    x = coords_ref[0, 0, :]
    y = coords_ref[0, 1, :]
    z = coords_ref[0, 2, :]
    wx = _axis_weights(x, w).astype(jnp.bfloat16)   # (T, W)
    wy = _axis_weights(y, h).astype(jnp.bfloat16)   # (T, H)
    wz = _axis_weights(z, d).astype(jnp.bfloat16)   # (T, D)
    ez, ey, ex = _expanders(d, h, w)
    # Mosaic requires 32-bit matmul accumulators; cast the product to bf16
    wz_e = jnp.dot(wz, ez, preferred_element_type=jnp.float32)
    wy_e = jnp.dot(wy, ey, preferred_element_type=jnp.float32)
    wx_e = jnp.dot(wx, ex, preferred_element_type=jnp.float32)
    return (wz_e * wy_e * wx_e).astype(jnp.bfloat16)  # (T, D·H·W)


def _fwd_kernel(coords_ref, vox_ref, out_ref, *, d, h, w):
    # coords_ref: (1, 3, TILE_N); vox_ref: (1, D*H*W, C); out: (1, TILE_N, C)
    wgt = _build_weights(coords_ref, d, h, w)
    out_ref[0] = jnp.dot(wgt, vox_ref[0].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)


def _bwd_kernel(coords_ref, g_ref, dvox_ref, acc, *, d, h, w, n_tiles):
    # grid: (B, n_tiles); accumulate wᵀ @ g over point tiles into scratch
    t = pl.program_id(1)
    wgt = _build_weights(coords_ref, d, h, w)
    contrib = jax.lax.dot_general(
        wgt, g_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        acc[:] = contrib

    @pl.when(t > 0)
    def _():
        acc[:] = acc[:] + contrib

    @pl.when(t == n_tiles - 1)
    def _():
        dvox_ref[0] = acc[:]


def _pad_points(coords, tile):
    b, n, _ = coords.shape
    pad = (-n) % tile
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.zeros((b, pad, 3), coords.dtype)], axis=1)
    return coords, n


def _forward(voxels, coords, *, interpret=False):
    b, d, h, w, c = voxels.shape
    coords_p, n = _pad_points(coords.astype(jnp.float32), TILE_N)
    n_pad = coords_p.shape[1]
    ct = jnp.swapaxes(coords_p, 1, 2)            # (B, 3, Npad)
    vox = voxels.reshape(b, d * h * w, c).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, h=h, w=w),
        grid=(b, n_pad // TILE_N),
        in_specs=[
            pl.BlockSpec((1, 3, TILE_N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d * h * w, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_N, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        interpret=interpret,
    )(ct, vox)
    return out[:, :n].astype(voxels.dtype)


def _backward_vox(coords, g, vox_shape, *, interpret=False):
    b, d, h, w, c = vox_shape
    coords_p, n = _pad_points(coords.astype(jnp.float32), TILE_N)
    n_pad = coords_p.shape[1]
    ct = jnp.swapaxes(coords_p, 1, 2)
    g_p = jnp.zeros((b, n_pad, c), jnp.float32).at[:, :n].set(
        g.astype(jnp.float32))
    n_tiles = n_pad // TILE_N
    dvox = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d, h=h, w=w, n_tiles=n_tiles),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, TILE_N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d * h * w, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d * h * w, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d * h * w, c), jnp.float32)],
        interpret=interpret,
    )(ct, g_p)
    return dvox.reshape(vox_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def trilinear_resample_mxu(voxels, coords, interpret=False):
    """MXU trilinear resample. voxels (B,D,H,W,C), coords (B,N,3) in voxel
    units (x→W, y→H, z→D), border-clamped. Returns (B,N,C)."""
    return _forward(voxels, coords, interpret=interpret)


def _fwd_rule(voxels, coords, interpret):
    # residuals must be JAX types; keeping the (already-live) voxels buffer
    # costs nothing and carries shape+dtype for the backward pass
    return _forward(voxels, coords, interpret=interpret), \
        (coords, jax.lax.stop_gradient(voxels))


def _bwd_rule(interpret, res, g):
    coords, voxels = res
    dvox = _backward_vox(coords, g, voxels.shape, interpret=interpret)
    return dvox.astype(voxels.dtype), jnp.zeros_like(coords)


trilinear_resample_mxu.defvjp(_fwd_rule, _bwd_rule)
