"""Pallas TPU kernel: trilinear volume resampling on the MXU.

The HoloGAN hot op (SURVEY §2.6 "custom Pallas grid-sample kernel"): resample
a (B, D, H, W, C) feature volume at (B, N, 3) continuous points. The XLA
fallback (ops/grid_sample.trilinear_resample) issues 8 dynamic gathers per
point — gathers serialise on the TPU's scalar/vector units (and the 2M-point
gather fails to even compile on this stack). This kernel reformulates the
interpolation as dense matmuls.

Kernel evolution (each step measured on v5e at HoloGAN shape, B=32, 16³×64
volume, 4096 pts/img):

  v1  one-hot tensor-product build: out = [wz⊗wy⊗wx](T,4096) @ vox(4096,C).
      3.5 ms fwd. The (T,4096) hat-function build dominates on the VPU.
  v2  VPU bit-decode of the flat index instead of expander matmuls:
      2.5 ms fwd (+35% end-to-end hologan).
  v3  (this file) FACTORED z: row scalings commute with the matmul, so
        out[t,c] = Σ_k hz[t,k] · U[t, k·C+c],   U = wyx @ V₂
      with wyx(T, H·W) the 2-D hat weights and V₂ the volume laid out as
      (H·W, D·C). ONE (T,256)@(256,1024) bf16 matmul at FULL 128-lane
      utilisation replaces the half-lane (T,4096)@(4096,64), and the VPU
      weight build shrinks 16× (only the H·W plane, never the D·H·W cube).
      The z-mixing Σ_k is 16 statically-sliced multiply-accumulates.

A shear-decomposition alternative (ops/shear_warp.py) with ~256× fewer
dense-equivalent FLOPs was built and measured 5× SLOWER (19.9 ms fwd): its
tiny batched (16,16)@(16,64) matmuls starve the MXU — on TPU, big
well-shaped matmuls beat algorithmically-leaner small ones.

Differentiation: custom VJP. The cotangent flows to the VOLUME only
(dV₂ = Σ_tiles wyxᵀ @ G₂ with G₂[t, k·C+c] = hz[t,k]·g[t,c] — the same
factored structure transposed); the sample coordinates get zero gradient —
in HoloGAN they derive from the randomly *sampled* view, not from
parameters (hologan_generator.py:119). The XLA fallback keeps full
coordinate gradients for any future caller that wants them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _plane_weights(coords_ref, h, w):
    """(T, H·W) bilinear hat weights for the y/x plane, f32.

    Mosaic only permits integer iota; decode the flat yx index per lane
    (integer div/mod — no power-of-two requirement)."""
    x = coords_ref[0, 0, :]
    y = coords_ref[0, 1, :]
    t = x.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (t, h * w), 1)
    jx = (j % w).astype(jnp.float32)
    jy = (j // w).astype(jnp.float32)
    xc = jnp.clip(x, 0.0, w - 1.0)
    yc = jnp.clip(y, 0.0, h - 1.0)
    return (jnp.maximum(0.0, 1.0 - jnp.abs(xc[:, None] - jx))
            * jnp.maximum(0.0, 1.0 - jnp.abs(yc[:, None] - jy)))


def _depth_weights(coords_ref, d):
    """(T, D) hat weights along z, f32."""
    z = coords_ref[0, 2, :]
    t = z.shape[0]
    k = jax.lax.broadcasted_iota(jnp.int32, (t, d), 1).astype(jnp.float32)
    zc = jnp.clip(z, 0.0, d - 1.0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(zc[:, None] - k))


def _fwd_kernel(coords_ref, vox_ref, out_ref, *, d, h, w, c):
    # coords_ref: (1, 3, T); vox_ref: (1, H·W, D·C) — z-major channel
    # packing; out: (1, T, C)
    wyx = _plane_weights(coords_ref, h, w).astype(jnp.bfloat16)
    hz = _depth_weights(coords_ref, d)
    # vox arrives pre-cast to bf16 (halves the HBM→VMEM stream and avoids
    # a (H·W, D·C) cast per point tile)
    u = jnp.dot(wyx, vox_ref[0],
                preferred_element_type=jnp.float32)     # (T, D·C) full-lane
    acc = hz[:, 0:1] * u[:, 0:c]
    for k in range(1, d):
        acc = acc + hz[:, k:k + 1] * u[:, k * c:(k + 1) * c]
    out_ref[0] = acc


def _plane_weights_t(coords_ref, h, w):
    """(H·W, T) bilinear hat weights, built directly transposed so the
    backward's contraction over T needs no in-kernel transpose of wyx."""
    x = coords_ref[0, 0, :]
    y = coords_ref[0, 1, :]
    t = x.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (h * w, t), 0)
    jx = (j % w).astype(jnp.float32)
    jy = (j // w).astype(jnp.float32)
    xc = jnp.clip(x, 0.0, w - 1.0)
    yc = jnp.clip(y, 0.0, h - 1.0)
    return (jnp.maximum(0.0, 1.0 - jnp.abs(xc[None, :] - jx))
            * jnp.maximum(0.0, 1.0 - jnp.abs(yc[None, :] - jy)))


def _bwd_kernel(coords_ref, g_ref, dvox_ref, acc, *, d, h, w, c, n_tiles):
    # grid: (B, n_tiles); accumulate wyxᵀ @ G₂ over point tiles into scratch;
    # G₂ packs the z-hat-scaled cotangent: G₂[t, k·C+c] = hz[t,k]·g[t,c]
    t_idx = pl.program_id(1)
    wyx_t = _plane_weights_t(coords_ref, h, w).astype(jnp.bfloat16)
    hz = _depth_weights(coords_ref, d)
    g = g_ref[0].astype(jnp.float32)                    # (T, C)
    g2 = jnp.concatenate([hz[:, k:k + 1] * g for k in range(d)],
                         axis=1).astype(jnp.bfloat16)   # (T, D·C)
    contrib = jnp.dot(wyx_t, g2,
                      preferred_element_type=jnp.float32)  # (H·W, D·C)

    @pl.when(t_idx == 0)
    def _():
        acc[:] = contrib

    @pl.when(t_idx > 0)
    def _():
        acc[:] = acc[:] + contrib

    @pl.when(t_idx == n_tiles - 1)
    def _():
        dvox_ref[0] = acc[:]


def _pad_points(coords, tile):
    n = coords.shape[1]
    pad = (-n) % tile
    if pad:
        # lax.pad (not concatenate-with-zeros): a materialised zeros block
        # would become a jaxpr constant, which the batch-partitioned
        # lowering (parallel/kernel_sharding.py) cannot carry
        coords = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
    return coords, n


def _vox_to_plane_major(voxels):
    """(B, D, H, W, C) → (B, H·W, D·C): the matmul contracts over the y/x
    plane; z stays as C-sized lane groups mixed by the hat weights."""
    b, d, h, w, c = voxels.shape
    v = jnp.transpose(voxels, (0, 2, 3, 1, 4))          # (B, H, W, D, C)
    return v.reshape(b, h * w, d * c).astype(jnp.bfloat16)


def _forward(voxels, coords, interpret=False):
    b, d, h, w, c = voxels.shape
    coords_p, n = _pad_points(coords.astype(jnp.float32), TILE_N)
    n_pad = coords_p.shape[1]
    ct = jnp.swapaxes(coords_p, 1, 2)                   # (B, 3, Npad)
    vox = _vox_to_plane_major(voxels)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, h=h, w=w, c=c),
        grid=(b, n_pad // TILE_N),
        in_specs=[
            pl.BlockSpec((1, 3, TILE_N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w, d * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_N, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        interpret=interpret,
    )(ct, vox)
    return out[:, :n].astype(voxels.dtype)


def _backward_vox(coords, g, d, h, w, c, interpret=False):
    b = coords.shape[0]   # from the (possibly shard-local) array, NOT a
    # static global shape — the batch-partitioned lowering runs this body
    # per shard (parallel/kernel_sharding.py)
    coords_p, n = _pad_points(coords.astype(jnp.float32), TILE_N)
    n_pad = coords_p.shape[1]
    ct = jnp.swapaxes(coords_p, 1, 2)
    g_p = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    n_tiles = n_pad // TILE_N
    dvox2 = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d, h=h, w=w, c=c, n_tiles=n_tiles),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, TILE_N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, d * c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, d * c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h * w, d * c), jnp.float32)],
        interpret=interpret,
    )(ct, g_p)
    # undo the plane-major packing: (B, H·W, D·C) → (B, D, H, W, C)
    dvox = dvox2.reshape(b, h, w, d, c)
    return jnp.transpose(dvox, (0, 3, 1, 2, 4))


def _fwd_sharded(voxels, coords, interpret):
    # batch-partitioned under a mesh — each chip resamples its local batch
    # shard (parallel/kernel_sharding.py); without this the partitioner
    # all-gathers the full volume batch around the custom call
    from ...parallel.kernel_sharding import batch_partitioned
    return batch_partitioned(
        _forward, "b d h w c, b n k -> b n c",
        statics=(interpret,))(voxels, coords)


def _bwd_sharded(coords, g, vox_shape, interpret):
    from ...parallel.kernel_sharding import batch_partitioned
    _, d, h, w, c = vox_shape
    return batch_partitioned(
        _backward_vox, "b n k, b n c -> b d h w c",
        statics=(d, h, w, c, interpret))(coords, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def trilinear_resample_mxu(voxels, coords, interpret=False):
    """MXU trilinear resample. voxels (B,D,H,W,C), coords (B,N,3) in voxel
    units (x→W, y→H, z→D), border-clamped. Returns (B,N,C)."""
    return _fwd_sharded(voxels, coords, interpret)


def _fwd_rule(voxels, coords, interpret):
    # residuals must be JAX types; keeping the (already-live) voxels buffer
    # costs nothing and carries shape+dtype for the backward pass
    return _fwd_sharded(voxels, coords, interpret), \
        (coords, jax.lax.stop_gradient(voxels))


def _bwd_rule(interpret, res, g):
    coords, voxels = res
    dvox = _bwd_sharded(coords, g, voxels.shape, interpret)
    return dvox.astype(voxels.dtype), jnp.zeros_like(coords)


trilinear_resample_mxu.defvjp(_fwd_rule, _bwd_rule)
