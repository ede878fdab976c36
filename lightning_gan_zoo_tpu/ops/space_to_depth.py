"""Space-to-depth conv reformulation for low-channel high-resolution convs.

STATUS: measured NEGATIVE result for stride-1 convs — kept as a tested
oracle + the record of why (the shear-warp lesson again, from the other
side).

The R1 ResNet's 128²×16ch convs occupy ≤16 of the MXU's 128 output lanes
(trace: 19 TF/s ≈ 10% of bf16 peak — tools/profile_superstep.py). A 2×2
space-to-depth transform turns a 3×3 stride-1 conv on (H, W, C) into a 3×3
conv on (H/2, W/2, 4C) with a sparsity-structured weight remap: 4× the lane
occupancy, but also 4× the raw FLOPs — and on the MXU's K×N-stationary
dataflow those exactly cancel: measured on v5e (batch 64, 128²×16→16, bf16)
plain 1.44 ms vs s2d 2.07 ms forward; fwd+bwd 2.01 vs 2.76 ms. XLA's
stride-1 low-channel convs already run near their lane ceiling, so the
inflation loses. (For STRIDE-2 convs s2d adds no FLOPs and would win ~4×,
but this zoo's only stride-2 ops are poolings, already reformulated as
diagonal MXU convs — models/layers.avg_pool_mxu.)

Math: with x'[i,j,(dy,dx,c)] = x[2i+dy, 2j+dx, c] and the remapped weights
below, conv(x', W')' ≡ conv(x, W) exactly (both SAME-padded); equality is
pinned in tests/test_models.py against jax's conv at every stage shape.

Channel convention: s2d channel index = (dy·2 + dx)·C + c.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) → (B, H/2, W/2, 4C), channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) → (B, 2H, 2W, C), inverse of space_to_depth."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, c)


def _s2d_index_maps(k: int):
    """For tap u∈[0,k) and output phase e∈{0,1} of a SAME-padded stride-1
    k×k conv: the s2d-space kernel offset U and input phase r, from
    t = e + u - (k//2):  U = floor(t/2) + K'//2,  r = t mod 2, with
    K' = 2·⌈(k//2)/2⌉ + 1 the (odd) s2d kernel size (3 for k=3 and k=5)."""
    kp = 2 * ((k // 2 + 1) // 2) + 1
    maps = {}
    for e in (0, 1):
        for u in range(k):
            t = e + u - k // 2
            maps[(e, u)] = (t // 2 + kp // 2, t % 2)
    return kp, maps


def conv_kernel_to_s2d(w: jax.Array) -> jax.Array:
    """(k, k, Ci, Co) stride-1 SAME kernel → (k', k', 4Ci, 4Co) s2d kernel.

    Built with a constant scatter matrix (traced once under jit; XLA folds
    it into a reshape-matmul on params, negligible against the conv)."""
    k, _, ci, co = w.shape
    kp, maps = _s2d_index_maps(k)
    # scatter[u, v, e_y, e_x, U, V, r_y, r_x] placement as a dense matmul:
    # flatten w to (k·k, Ci·Co) and expand with a (k·k, kp·kp·4·4) one-hot.
    onehot = np.zeros((k * k, 2, 2, kp * kp * 4), np.float32)
    for ey in (0, 1):
        for ex in (0, 1):
            for u in range(k):
                for v in range(k):
                    uu, ry = maps[(ey, u)]
                    vv, rx = maps[(ex, v)]
                    onehot[u * k + v, ey, ex,
                           (uu * kp + vv) * 4 + (ry * 2 + rx)] = 1.0
    onehot = jnp.asarray(onehot)  # (k², 2, 2, kp²·4)
    wf = w.reshape(k * k, ci * co)
    # out[(U,V,r), (e, ci·co)] — einsum keeps everything dense
    big = jnp.einsum("ts,tabp->pabs", wf.astype(jnp.float32), onehot)
    # big: (kp²·4phase_in, 2, 2, ci·co) → (kp, kp, 4Ci, 4Co)
    big = big.reshape(kp, kp, 2, 2, 2, 2, ci, co)      # U V ry rx ey ex ci co
    big = jnp.transpose(big, (0, 1, 2, 3, 6, 4, 5, 7))  # U V ry rx ci ey ex co
    return big.reshape(kp, kp, 4 * ci, 4 * co).astype(w.dtype)


def conv_s2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME-padded stride-1 conv computed in space-to-depth space.

    x: (B, H, W, Ci) with even H, W;  w: (k, k, Ci, Co) with odd k.
    Returns conv(x, w) exactly, as (B, H, W, Co)."""
    w2 = conv_kernel_to_s2d(w)
    kp = w2.shape[0]
    pad = kp // 2
    y2 = jax.lax.conv_general_dilated(
        space_to_depth(x), w2, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(y2)
