"""Pallas TPU kernel: fused R1-ResNet block core (conv3x3+LeakyReLU+conv3x3).

THE PROBLEM (ops/lane_pack.py has the full four-formulation negative
record): the gan_stability_r1 ResNet (reference
core/submodules/gan_stability/models/resnet.py:97-129, nfilter=16) spends
~78% of its superstep in 128^2/64^2 stride-1 3x3 convs whose 16/32 output
channels occupy <=32 of the MXU's 128 lanes. Every XLA-level packing fix
regressed end-to-end because it fenced XLA's whole-graph fusion. The one
untried lever (ROADMAP.md): fuse the WHOLE block core in ONE Pallas kernel
with in-VMEM intermediates and a hand-written backward.

THE FORMULATION. One group size G = 128 // max(ci, fh, fo) for the whole
block. Tensors live in "group-packed" layout (B, H, W/G, G*C) end to end
(the pack/unpack reshapes are contiguous row-major and happen in XLA
outside the kernel — Mosaic cannot re-lane inside). A stride-1 SAME 3x3
conv becomes a full-lane matmul: for output group j, the im2col row holds
the 3 x (G+2) x Cin input span [j*G-1, j*G+G+1) — assembled from the
packed value with two `pltpu.roll`s along the group axis plus lane slices,
edge groups masked to zero — and the packed weight matrix
    Bm[(dy, s, ci), (g, co)] = W[dy, s-g, ci, co]  (0 <= s-g < 3, else 0)
yields all G columns x co channels in one row. Span overhead is (G+2)/3
~ 3.3x dense FLOPs, but lane utilisation goes 16/128 -> 128/128 and K
packs into ceil(K/128) full MXU passes. The last K slot carries a
constant 1 so the bias rides the matmul (and the bias gradient falls out
of the packed weight-gradient for free).

Both convs + both LeakyReLUs run per (batch, row-tile) grid instance with
every intermediate in VMEM; the backward kernel recomputes the
activations (residuals never touch HBM), forms du = act'(U) * conv2^T(g),
dx = act'(x) * conv1^T(du), and accumulates the two packed weight
gradients across the sequential TPU grid in f32 scratch. The weight-grad
contraction — XLA's worst op here (a (3,3,16,16) kernel-grad through a
16x16 MXU corner, 3.7 TF/s isolated) — becomes a (K, rows)@(rows, 128)
full-lane matmul.

Second order (R1's grad-of-grad, reference core/utils/utils.py:60-69):
the backward op is itself a custom_vjp whose OWN backward differentiates
the plain-XLA reference implementation — the hot first-order paths run the
Pallas kernels while the R1 penalty's double-backward lowers through XLA
exactly as the unfused build does.

Numerics: matmuls run bf16 inputs with f32 accumulation (the AMP
precision the r1 config trains at). Where a pre-activation U lands within
bf16 resolution of 0 the LeakyReLU mask can flip vs an f32 reference —
an inherent borderline effect of the precision, producing isolated 3x3
patches of O(slope-gap) gradient difference (tests assert on quantiles).

Residual/shortcut stay outside: models/resnet_stability.ResnetBlock calls
this core and keeps `x_s + 0.1*core(x)` in XLA (reference resnet.py:120).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pick_group(c: int, w: int) -> int:
    """Largest power-of-two G with G*c <= 128, G <= 32, W % G == 0 and at
    least two groups per row (the span needs a real left/right
    neighbour)."""
    g = 1
    while (g * 2 * c <= 128 and g * 2 <= 32 and w % (g * 2) == 0
           and w // (g * 2) >= 2):
        g *= 2
    return g


def _block_group(w: int, ci: int, fh: int, fo: int) -> int:
    """ONE group size for the whole block (uniform packed layout — no
    re-laning between the convs; a narrower conv just uses fewer lanes,
    which costs the MXU nothing below 128)."""
    return _pick_group(max(ci, fh, fo), w)


def eligible(h: int, w: int, ci: int, fh: int, fo: int) -> bool:
    """Shapes the fused kernel supports AND can plausibly win on."""
    g = _block_group(w, ci, fh, fo)
    th = min(h, 32)
    return (max(ci, fh, fo) <= 64 and min(h, w) >= 4 and h % th == 0
            and g >= 2 and w // g >= 2)


@functools.lru_cache(maxsize=None)
def _span_onehot(g: int) -> np.ndarray:
    """M[s, j, kx] = 1 iff span column s (absolute col j*G-1+s) is tap kx
    of output column j."""
    m = np.zeros((g + 2, g, 3), np.float32)
    for j in range(g):
        for kx in range(3):
            m[j + kx, j, kx] = 1.0
    return m


def _kdim(g: int, c: int) -> int:
    # 3 rows x (G+2) span cols x C channels, +1 ones slot, 128-padded
    return _round_up(3 * (g + 2) * c + 1, 128)


def _pack_weight(w: jax.Array, b, g: int) -> jax.Array:
    """(3, 3, ci, co) [+ (co,) bias] -> (Kp, G*co) packed matmul matrix."""
    _, _, ci, co = w.shape
    m = jnp.asarray(_span_onehot(g), w.dtype)
    bmat = jnp.einsum("sjk,dkio->dsijo", m, w)          # (3, G+2, ci, G, co)
    k = 3 * (g + 2) * ci
    kp = _kdim(g, ci)
    full = jnp.zeros((kp, g * co), w.dtype)
    full = full.at[:k].set(bmat.reshape(k, g * co))
    if b is not None:
        full = full.at[k].set(jnp.tile(b.astype(w.dtype), (g,)))
    return full


def _unpack_dw(dbp: jax.Array, g: int, ci: int, co: int):
    """Packed weight-grad (Kp, G*co) -> ((3,3,ci,co), (co,))."""
    k = 3 * (g + 2) * ci
    m = jnp.asarray(_span_onehot(g), dbp.dtype)
    core = dbp[:k].reshape(3, g + 2, ci, g, co)
    dw = jnp.einsum("sjk,dsijo->dkio", m, core)
    db = jnp.sum(dbp[k].reshape(g, co), axis=0)
    return dw, db


def _rot_t(w: jax.Array) -> jax.Array:
    """Kernel of the transposed conv: 180deg rotation + io swap."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


# -- kernel helpers ----------------------------------------------------------

def _leaky(x):
    # compare in f32: Mosaic's vector compare has no bf16 path on v5e
    # ("Target does not support this comparison", real-TPU compile).
    # Dtype-preserving: plain_core is also the R1 second-order lowering
    # (_core_bwd_bwd), where a bf16 input must produce a bf16 output or the
    # double-backward cotangent dtypes mismatch under jax.vjp.
    xf = x.astype(jnp.float32)
    return jnp.where(xf >= 0, xf, 0.2 * xf).astype(x.dtype)


def _span(t, g: int, c: int):
    """Packed rows (R, J, G*C) -> (R, J, (G+2)*C) horizontal span: the
    left/right neighbours come from rolling the group axis; the wrapped
    edge groups are SAME-padding zeros."""
    r, j, _ = t.shape
    # static ±1 circular shifts along the group axis, written as
    # slice+concat: pltpu.roll lowers to tpu.dynamic_rotate, which Mosaic
    # has no bf16 path for ("Rotate with non-32-bit data", real-TPU compile)
    left = jnp.concatenate([t[:, -1:], t[:, :-1]], axis=1)[..., (g - 1) * c:]
    right = jnp.concatenate([t[:, 1:], t[:, :1]], axis=1)[..., :c]
    jidx = jax.lax.broadcasted_iota(jnp.int32, (r, j, 1), 1)
    left = jnp.where(jidx == 0, 0.0, left)
    right = jnp.where(jidx == j - 1, 0.0, right)
    return jnp.concatenate([left, t, right], axis=-1)


def _im2col(slab, row0: int, nrows: int, g: int, c: int, kp: int):
    """Span-im2col rows (nrows*J, Kp) bf16 from a packed (R, J, G*C)
    value/ref: K layout (dy, s, ci) ascending + trailing 1.0 (bias slot)
    + zero K-pad."""
    full = _span(slab[row0:row0 + nrows + 2], g, c)     # (nrows+2, J, (G+2)C)
    j = full.shape[1]
    pieces = [full[dy:dy + nrows] for dy in range(3)]
    k = 3 * (g + 2) * c
    pieces.append(jnp.ones((nrows, j, 1), jnp.bfloat16))
    if kp - k - 1:
        pieces.append(jnp.zeros((nrows, j, kp - k - 1), jnp.bfloat16))
    return jnp.concatenate(pieces, axis=-1).reshape(nrows * j, kp)


def _assemble(slab, cur, prev, nxt, j, nj, th):
    """Zero-padded (TH+4, J, G*C) packed slab with 2-row vertical halos
    from the neighbouring row-tiles."""
    dt = slab.dtype
    slab[:] = jnp.zeros_like(slab)
    slab[2:th + 2] = cur[0].astype(dt)

    @pl.when(j > 0)
    def _():
        slab[0:2] = prev[0, th - 2:th].astype(dt)

    @pl.when(j < nj - 1)
    def _():
        slab[th + 2:th + 4] = nxt[0, 0:2].astype(dt)


def _mask_fake_rows(t, j, nj, th):
    """Zero rows 0 / TH+1 of a (TH+2, J, L) value when they fall outside
    the image (U/du at y=-1 / y=H are SAME-padding zeros, not outputs)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (t.shape[0], 1, 1), 0)
    t = jnp.where(jnp.logical_and(j == 0, r == 0), 0.0, t)
    return jnp.where(
        jnp.logical_and(j == nj - 1, r == t.shape[0] - 1), 0.0, t)


def _fwd_kernel(xp, xc, xn, b1p, b2p, out, slab_v, *,
                th, g, ci, fh, fo):
    j, nj = pl.program_id(1), pl.num_programs(1)
    _assemble(slab_v, xc, xp, xn, j, nj, th)
    slab_v[:] = _leaky(slab_v[:]).astype(jnp.bfloat16)

    # conv1 over U rows [t0-1, t0+TH+1)
    a1 = _im2col(slab_v, 0, th + 2, g, ci, _kdim(g, ci))
    u = jnp.dot(a1, b1p[:], preferred_element_type=jnp.float32)
    nj_w = slab_v.shape[1]
    u3 = _mask_fake_rows(
        _leaky(u).reshape(th + 2, nj_w, g * fh), j, nj, th)

    a2 = _im2col(u3.astype(jnp.bfloat16), 0, th, g, fh, _kdim(g, fh))
    y = jnp.dot(a2, b2p[:], preferred_element_type=jnp.float32)
    out[0] = y.reshape(th, nj_w, g * fo).astype(out.dtype)


def _bwd_kernel(xp, xc, xn, gp, gc, gn, b1p, b2tp, b1tp,
                dx, dw1p, dw2p, slab_v, slab_g, accw1, accw2, *,
                th, g, ci, fh, fo):
    b_i, j = pl.program_id(0), pl.program_id(1)
    nb, nj = pl.num_programs(0), pl.num_programs(1)
    _assemble(slab_v, xc, xp, xn, j, nj, th)
    slab_v[:] = _leaky(slab_v[:]).astype(jnp.bfloat16)
    _assemble(slab_g, gc, gp, gn, j, nj, th)

    # recompute U in VMEM (residuals never stored to HBM)
    kp1 = _kdim(g, ci)
    a1 = _im2col(slab_v, 0, th + 2, g, ci, kp1)
    u = jnp.dot(a1, b1p[:], preferred_element_type=jnp.float32)
    nj_w = slab_v.shape[1]
    u3 = u.reshape(th + 2, nj_w, g * fh)
    w3 = _mask_fake_rows(_leaky(u3), j, nj, th).astype(jnp.bfloat16)

    # dW2 += im2col(w)^T @ g over this tile's TH real out rows
    a2 = _im2col(w3, 0, th, g, fh, _kdim(g, fh))
    g_pack = slab_g[2:th + 2].reshape(th * nj_w, g * fo)
    c2 = jax.lax.dot_general(a2, g_pack, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    # du = act'(U) * conv2^T(g) on U rows [t0-1, t0+TH+1): du row r reads
    # g rows r-1..r+1 = slab_g rows m..m+2 for m = r-(t0-1)
    a2t = _im2col(slab_g, 0, th + 2, g, fo, _kdim(g, fo))
    du_raw = jnp.dot(a2t, b2tp[:], preferred_element_type=jnp.float32)
    du = jnp.where(u >= 0, du_raw, 0.2 * du_raw)
    du3 = _mask_fake_rows(du.reshape(th + 2, nj_w, g * fh), j, nj, th
                          ).astype(jnp.bfloat16)

    # dW1 += im2col(v)^T @ du over the TH real U rows (halo rows belong to
    # the neighbouring tiles' accumulation)
    c1 = jax.lax.dot_general(
        a1[nj_w:(th + 1) * nj_w],
        du3[1:th + 1].reshape(th * nj_w, g * fh),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    first = jnp.logical_and(b_i == 0, j == 0)

    @pl.when(first)
    def _():
        accw1[:] = c1
        accw2[:] = c2

    @pl.when(jnp.logical_not(first))
    def _():
        accw1[:] = accw1[:] + c1
        accw2[:] = accw2[:] + c2

    # dv = conv1^T(du); dx = act'(x) * dv. dv row r reads du rows r-1..r+1
    # = du3 rows m..m+2 for m = r-t0-1+1
    a3 = _im2col(du3, 0, th, g, fh, _kdim(g, fh))
    dv = jnp.dot(a3, b1tp[:], preferred_element_type=jnp.float32)
    dv = dv.reshape(th, nj_w, g * ci)
    v_c = slab_v[2:th + 2].astype(jnp.float32)
    dx[0] = jnp.where(v_c >= 0, dv, 0.2 * dv).astype(dx.dtype)

    @pl.when(jnp.logical_and(b_i == nb - 1, j == nj - 1))
    def _():
        dw1p[:] = accw1[:]
        dw2p[:] = accw2[:]


# -- host-side wiring --------------------------------------------------------

def _plan(x_shape, fh, fo):
    b, h, w, ci = x_shape
    th = min(h, 32)
    return b, h, w, ci, th, _block_group(w, ci, fh, fo)


def _halo_specs(th, j, l):
    """(prev, cur, next) BlockSpecs over packed (B, H, J, L) row-tiles."""
    def mk(off):
        def imap(i, jj):
            if off < 0:
                return (i, jnp.maximum(jj - 1, 0), 0, 0)
            if off > 0:
                return (i, jnp.minimum(jj + 1, pl.num_programs(1) - 1), 0, 0)
            return (i, jj, 0, 0)
        return pl.BlockSpec((1, th, j, l), imap, memory_space=pltpu.VMEM)
    return [mk(-1), mk(0), mk(1)]


def _packed(t, g):
    b, h, w, c = t.shape
    return t.reshape(b, h, w // g, g * c)


def _fwd_inner(x, b1p, b2p, fh, fo, interpret):
    """Packed-weight forward core: no captured constants, so it can lower
    inside the batch partition (parallel/kernel_sharding.py) — the np
    one-hot packing tables live in _pack_weight, called OUTSIDE."""
    b, h, w, ci, th, g = _plan(x.shape, fh, fo)
    nj_w = w // g
    xs = _halo_specs(th, nj_w, g * ci)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, g=g, ci=ci, fh=fh, fo=fo),
        grid=(b, h // th),
        in_specs=xs + [
            pl.BlockSpec(b1p.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2p.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, nj_w, g * fo),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, nj_w, g * fo), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 4, nj_w, g * ci), jnp.bfloat16)],
        interpret=interpret,
    )(_packed(x, g), _packed(x, g), _packed(x, g), b1p, b2p)
    return y.reshape(b, h, w, fo)


def _bwd_inner(x, g_ct, b1p, b2tp, b1tp, fh, fo, interpret):
    """Packed-weight backward core (see _fwd_inner): returns dx plus the
    PACKED weight-gradient partials — unpacking (np one-hot tables) and the
    linear psum over batch shards both happen outside, and commute."""
    b, h, w, ci, th, g = _plan(x.shape, fh, fo)
    kp1, kp2 = _kdim(g, ci), _kdim(g, fh)
    nj_w = w // g
    xs = _halo_specs(th, nj_w, g * ci)
    gs = _halo_specs(th, nj_w, g * fo)
    rep = [pl.BlockSpec(m.shape, lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)
           for m in (b1p, b2tp, b1tp)]
    xpk, gpk = _packed(x, g), _packed(g_ct.astype(jnp.bfloat16), g)
    dx, dw1p, dw2p = pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, g=g, ci=ci, fh=fh, fo=fo),
        grid=(b, h // th),
        in_specs=xs + gs + rep,
        out_specs=[
            pl.BlockSpec((1, th, nj_w, g * ci), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp1, g * fh), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp2, g * fo), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nj_w, g * ci), x.dtype),
            jax.ShapeDtypeStruct((kp1, g * fh), jnp.float32),
            jax.ShapeDtypeStruct((kp2, g * fo), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 4, nj_w, g * ci), jnp.bfloat16),
            pltpu.VMEM((th + 4, nj_w, g * fo), jnp.bfloat16),
            pltpu.VMEM((kp1, g * fh), jnp.float32),
            pltpu.VMEM((kp2, g * fo), jnp.float32),
        ],
        interpret=interpret,
    )(xpk, xpk, xpk, gpk, gpk, gpk, b1p, b2tp, b1tp)
    return dx.reshape(b, h, w, ci), dw1p, dw2p


def _bwd(x, w1, b1, w2, b2, g_ct, interpret=False):
    g = _block_group(x.shape[2], x.shape[3], w1.shape[-1], w2.shape[-1])
    fh, fo = w1.shape[-1], w2.shape[-1]
    b1p = _pack_weight(w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16), g)
    b2tp = _pack_weight(_rot_t(w2).astype(jnp.bfloat16), None, g)
    b1tp = _pack_weight(_rot_t(w1).astype(jnp.bfloat16), None, g)
    dx, dw1p, dw2p = _bwd_inner(x, g_ct, b1p, b2tp, b1tp, fh, fo, interpret)
    dw1, db1 = _unpack_dw(dw1p, g, x.shape[3], fh)
    dw2, db2 = _unpack_dw(dw2p, g, fh, fo)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


def plain_core(x, w1, b1, w2, b2):
    """Reference XLA implementation (and the second-order lowering)."""
    def conv(h, k):
        return jax.lax.conv_general_dilated(
            h, k.astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    v = _leaky(x)
    u = conv(v, w1) + b1.astype(x.dtype)
    return conv(_leaky(u), w2) + b2.astype(x.dtype)


def _fwd_sharded(x, w1, b1, w2, b2, interpret):
    # batch-partitioned under a mesh: each chip runs the fused block on its
    # local batch shard, packed weights replicate
    # (parallel/kernel_sharding.py; packing happens OUT here because its np
    # one-hot tables would be constants the partition cannot carry)
    from ...parallel.kernel_sharding import batch_partitioned
    g = _block_group(x.shape[2], x.shape[3], w1.shape[-1], w2.shape[-1])
    b1p = _pack_weight(w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16), g)
    b2p = _pack_weight(w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16), g)
    return batch_partitioned(
        _fwd_inner, "b h w i, c d, e f -> b h w o",
        statics=(w1.shape[-1], w2.shape[-1], interpret))(x, b1p, b2p)


def _bwd_sharded(x, w1, b1, w2, b2, g_ct, interpret):
    # packed weight-grad partials (results 1-2) are per-shard sums — psum'd
    # inside the partition, exactly like XLA's own parameter gradients;
    # unpacking is linear, so psum-then-unpack == unpack-then-psum
    from ...parallel.kernel_sharding import batch_partitioned
    g = _block_group(x.shape[2], x.shape[3], w1.shape[-1], w2.shape[-1])
    fh, fo = w1.shape[-1], w2.shape[-1]
    b1p = _pack_weight(w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16), g)
    b2tp = _pack_weight(_rot_t(w2).astype(jnp.bfloat16), None, g)
    b1tp = _pack_weight(_rot_t(w1).astype(jnp.bfloat16), None, g)
    dx, dw1p, dw2p = batch_partitioned(
        _bwd_inner, ("b h w i, b h w o, c d, e f, k m -> "
                     "b h w i, p q, r s"),
        reduced_out=(1, 2),
        statics=(fh, fo, interpret))(x, g_ct, b1p, b2tp, b1tp)
    dw1, db1 = _unpack_dw(dw1p, g, x.shape[3], fh)
    dw2, db2 = _unpack_dw(dw2p, g, fh, fo)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


# first-order backward op, itself differentiable (R1 grad-of-grad)
@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _core_bwd(x, w1, b1, w2, b2, g, interpret=False):
    return _bwd_sharded(x, w1, b1, w2, b2, g, interpret)


def _core_bwd_fwd(x, w1, b1, w2, b2, g, interpret):
    # self-reference keeps the custom_vjp boundary in the residual jaxpr:
    # after one differentiation this rule is inlined, and a THIRD-order
    # trace must still meet a protected op, not a raw pallas_call
    return _core_bwd(x, w1, b1, w2, b2, g, interpret), \
        (x, w1, b1, w2, b2, g)


def _core_bwd_bwd(interpret, res, cots):
    x, w1, b1, w2, b2, g = res

    def ref_bwd(x, w1, b1, w2, b2, g):
        _, vjp = jax.vjp(plain_core, x, w1, b1, w2, b2)
        return vjp(g)

    _, vjp2 = jax.vjp(ref_bwd, x, w1, b1, w2, b2, g)
    return vjp2(tuple(cots))


_core_bwd.defvjp(_core_bwd_fwd, _core_bwd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_block_core(x, w1, b1, w2, b2, interpret=False):
    """conv3x3(leaky(conv3x3(leaky(x)) + b1)) + b2 as ONE fused TPU kernel
    (caller adds shortcut and the 0.1 residual scale, resnet.py:120)."""
    return _fwd_sharded(x, w1, b1, w2, b2, interpret)


def _core_fwd_rule(x, w1, b1, w2, b2, interpret):
    # self-reference (see _core_bwd_fwd): the inlined fwd rule left a raw
    # pallas_call in the R1 grad-of-grad jaxpr, whose dead-code JVP the
    # outer grad then choked on — keep the boundary instead
    return fused_block_core(x, w1, b1, w2, b2, interpret), \
        (x, w1, b1, w2, b2)


def plain_core_grads(x, w1, b1, w2, b2, g):
    """Reference first-order gradients via the plain-XLA core (test oracle
    for the sharded backward)."""
    _, vjp = jax.vjp(plain_core, x, w1, b1, w2, b2)
    return vjp(g)


def _core_bwd_rule(interpret, res, g):
    x, w1, b1, w2, b2 = res
    return _core_bwd(x, w1, b1, w2, b2, g, interpret)


fused_block_core.defvjp(_core_fwd_rule, _core_bwd_rule)
