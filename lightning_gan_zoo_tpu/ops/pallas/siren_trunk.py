"""Pallas TPU kernel: fused FiLM-SIREN trunk (π-GAN / ANIGAN hot path).

The 6+1-layer SIREN trunk (nerf/siren.SirenNet) is the π-GAN superstep's
largest cost block (~37% at training shape). XLA runs it as 7 separate
Dense dot_generals per pass; in the BACKWARD pass the elementwise
sine-derivative/FiLM chains materialise per layer and are re-read by three
consumers each (dx dot, dW dot, dγ/dβ reductions), and several of the
transposed dots lower to VPU multiply-reduce fusions (trace:
tools/profile_superstep.py pigan — multiply_reduce_fusion.1/.4/.10-.16 map
to SirenNet Dense dot_generals via HLO op_name metadata).

This kernel runs the WHOLE trunk per row-tile with weights VMEM-resident
across the grid and activations never leaving VMEM between layers:

  fwd:  x(TM,Cin) → [dot → +b → γ·+β → sin(w0·)]×L → h(TM,H)
  bwd:  recompute the forward stashing per-layer pre-activations in VMEM,
        then walk the layers backward accumulating dW/db/dγ/dβ into
        revisited output blocks (f32) and chaining dh on the MXU.

Each tile is processed as TWO interleaved halves: the sine/FiLM chain of
one half (VPU) overlaps the next matmul of the other half (MXU) — the
dependent chain would otherwise idle the MXU during every transcendental.
The final (unfilmed) layer is a STATIC property (film_layers), not padded
γ=1/β=0 rows — keeping γ/β in their natural (B, n_film, H) shape avoids
per-step concat/broadcast prep that measurably eats into the win.

Numerics follow nerf/siren.Siren exactly: layer 0 fully f32 (w0=30 makes
bf16 pre-activations phase-garbage), later layers matmul/FiLM in bf16 with
the sine ARGUMENT in f32, sine = ops/fast_math.fast_sin's polynomial (the
backward uses the polynomial's own derivative so gradients match autodiff
of the unfused path to bf16 tolerance).

Reference counterpart: core/nerf/implicit_function.py:101-128 (SirenNet).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fast_math import _C1, _C2, _INV_TWO_PI, _S1, _S3, _S5, _S7

TILE_M = 512
HALF = TILE_M // 2


def _sin_poly(x):
    """fast_sin's reduction + polynomial, returning (sin, dsin/dx) — the
    derivative is the POLYNOMIAL's derivative so it matches autodiff of the
    unfused fast_sin path."""
    x = x.astype(jnp.float32)
    k = jnp.round(x * _INV_TWO_PI)
    r = x - k * _C1 - k * _C2
    r2 = r * r
    s = r * (_S1 + r2 * (_S3 + r2 * (_S5 + r2 * _S7)))
    ds = _S1 + r2 * (3.0 * _S3 + r2 * (5.0 * _S5 + r2 * (7.0 * _S7)))
    return s, ds


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _pre(h, w, b, first: bool):
    """Wx+b in the layer's compute dtype (f32 first layer, else bf16)."""
    if first:
        return _dot(h, w) + b
    return _dot(h, w).astype(jnp.bfloat16) + b.astype(jnp.bfloat16)


def _film_sin(a, g, bt, w0, first: bool, filmed: bool):
    if filmed:
        if first:
            f = g * a + bt
        else:
            f = g.astype(jnp.bfloat16) * a + bt.astype(jnp.bfloat16)
    else:
        f = a
    s, _ = _sin_poly(w0 * f.astype(jnp.float32))
    return s.astype(jnp.bfloat16)


def _fwd_kernel(x_ref, w0_ref, wm_ref, b_ref, g_ref, bt_ref, o_ref,
                *, w0s: Tuple[float, ...], n_film: int):
    L = len(w0s)
    # two interleaved halves: VPU (sine/FiLM) of one half overlaps the
    # MXU matmul of the other
    hs = [x_ref[0, :HALF], x_ref[0, HALF:]]
    for i in range(L):
        w = w0_ref[:] if i == 0 else wm_ref[i - 1]
        filmed = i < n_film
        g = g_ref[0, i] if filmed else None
        bt = bt_ref[0, i] if filmed else None
        a0 = _pre(hs[0], w, b_ref[i], i == 0)
        a1 = _pre(hs[1], w, b_ref[i], i == 0)
        hs = [_film_sin(a0, g, bt, w0s[i], i == 0, filmed),
              _film_sin(a1, g, bt, w0s[i], i == 0, filmed)]
    o_ref[0, :HALF] = hs[0]
    o_ref[0, HALF:] = hs[1]


def _bwd_kernel(x_ref, w0_ref, wm_ref, b_ref, g_ref, bt_ref, dy_ref,
                dx_ref, dw0_ref, dwm_ref, db_ref, dg_ref, dbt_ref,
                a_sc, h_sc, *, w0s: Tuple[float, ...], n_film: int):
    L = len(w0s)
    first_all = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    first_m = pl.program_id(1) == 0

    @pl.when(first_all)
    def _():
        dw0_ref[:] = jnp.zeros(dw0_ref.shape, dw0_ref.dtype)
        dwm_ref[:] = jnp.zeros(dwm_ref.shape, dwm_ref.dtype)
        db_ref[:] = jnp.zeros(db_ref.shape, db_ref.dtype)

    @pl.when(first_m)
    def _():
        dg_ref[:] = jnp.zeros(dg_ref.shape, dg_ref.dtype)
        dbt_ref[:] = jnp.zeros(dbt_ref.shape, dbt_ref.dtype)

    # ---- recompute forward, stashing pre-acts and layer inputs
    x = x_ref[0]
    hs = [x[:HALF], x[HALF:]]
    for i in range(L):
        w = w0_ref[:] if i == 0 else wm_ref[i - 1]
        filmed = i < n_film
        g = g_ref[0, i] if filmed else None
        bt = bt_ref[0, i] if filmed else None
        if i > 0:
            h_sc[i - 1, :HALF] = hs[0]
            h_sc[i - 1, HALF:] = hs[1]
        a0 = _pre(hs[0], w, b_ref[i], i == 0)
        a1 = _pre(hs[1], w, b_ref[i], i == 0)
        a_sc[i, :HALF] = a0.astype(jnp.float32)
        a_sc[i, HALF:] = a1.astype(jnp.float32)
        hs = [_film_sin(a0, g, bt, w0s[i], i == 0, filmed),
              _film_sin(a1, g, bt, w0s[i], i == 0, filmed)]

    # ---- backward walk
    dh = dy_ref[0].astype(jnp.float32)
    for i in range(L - 1, -1, -1):
        a = a_sc[i]
        filmed = i < n_film
        if filmed:
            g = g_ref[0, i].astype(jnp.float32)
            f = g * a + bt_ref[0, i].astype(jnp.float32)
        else:
            f = a
        _, ds = _sin_poly(w0s[i] * f)
        df = dh * ds * w0s[i]
        if filmed:
            dg_ref[0, i] += jnp.sum(df * a, axis=0)
            dbt_ref[0, i] += jnp.sum(df, axis=0)
            da = df * g
        else:
            da = df
        db_ref[i] += jnp.sum(da, axis=0)
        da_b = da.astype(jnp.bfloat16)
        if i == 0:
            dw0_ref[:] += jax.lax.dot_general(
                x, da, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx_ref[0] = jax.lax.dot_general(
                da, w0_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            h_in = h_sc[i - 1]
            dwm_ref[i - 1] += jax.lax.dot_general(
                h_in, da_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh = jax.lax.dot_general(
                da_b, wm_ref[i - 1], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


def _pad_m(x, tile):
    m = x.shape[1]
    pad = (-m) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, m


_FWD_RULE = "b m i, i h, l p q, k r, b f s, b f t -> b m u"
_BWD_RULE = ("b m i, i h, l p q, k r, b f s, b f t, b m u -> "
             "b m i, i h, l p q, k r, b f s, b f t")


def _fwd_sharded(x, w0k, wmid, bs, gammas, betas, w0s, interpret):
    # batch-partitioned under a mesh: each chip runs its local batch of
    # ray/point rows; weights replicate (parallel/kernel_sharding.py)
    from ...parallel.kernel_sharding import batch_partitioned
    return batch_partitioned(
        _trunk_fwd_impl, _FWD_RULE,
        statics=(tuple(w0s), interpret))(x, w0k, wmid, bs, gammas, betas)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def siren_trunk(x, w0k, wmid, bs, gammas, betas,
                w0s: Tuple[float, ...], interpret: bool = False):
    """Fused FiLM-SIREN trunk.

    x: (B, M, Cin) f32 · w0k: (Cin, H) f32 · wmid: (L-1, H, H) f32
    bs: (L, H) f32 · gammas/betas: (B, n_film, H) f32 — FiLM applies to the
    first n_film layers (layers ≥ n_film run unmodulated, statically).
    w0s: static per-layer sine frequencies, len L. Returns (B, M, H) bf16.
    """
    return _fwd_sharded(x, w0k, wmid, bs, gammas, betas, w0s, interpret)


def _trunk_fwd_impl(x, w0k, wmid, bs, gammas, betas, w0s, interpret):
    b, m, cin = x.shape
    h = w0k.shape[1]
    n_film = gammas.shape[1]
    xp, m0 = _pad_m(x.astype(jnp.float32), TILE_M)
    mp = xp.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, w0s=tuple(w0s), n_film=n_film),
        grid=(b, mp // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M, cin), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wmid.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bs.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_film, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_film, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_M, h), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, mp, h), jnp.bfloat16),
        interpret=interpret,
    )(xp, w0k.astype(jnp.float32), wmid.astype(jnp.bfloat16),
      bs.astype(jnp.float32), gammas.astype(jnp.float32),
      betas.astype(jnp.float32))
    return out[:, :m0]


def _trunk_fwd_rule(x, w0k, wmid, bs, gammas, betas, w0s, interpret):
    out = _fwd_sharded(x, w0k, wmid, bs, gammas, betas, w0s, interpret)
    return out, (x, w0k, wmid, bs, gammas, betas)


def _trunk_bwd_rule(w0s, interpret, res, dy):
    x, w0k, wmid, bs, gammas, betas = res
    # weight grads (indices 1-3) are per-shard partial sums over the local
    # batch rows — psum'd to the true gradient inside the partition
    from ...parallel.kernel_sharding import batch_partitioned
    return batch_partitioned(
        _trunk_bwd_impl, _BWD_RULE, reduced_out=(1, 2, 3),
        statics=(tuple(w0s), interpret))(x, w0k, wmid, bs, gammas, betas,
                                         dy)


def _trunk_bwd_impl(x, w0k, wmid, bs, gammas, betas, dy, w0s, interpret):
    b, m, cin = x.shape
    h = w0k.shape[1]
    L = bs.shape[0]
    n_film = gammas.shape[1]
    xp, m0 = _pad_m(x.astype(jnp.float32), TILE_M)
    dyp, _ = _pad_m(dy.astype(jnp.bfloat16), TILE_M)
    mp = xp.shape[1]
    dx, dw0, dwm, db, dg, dbt = pl.pallas_call(
        functools.partial(_bwd_kernel, w0s=tuple(w0s), n_film=n_film),
        grid=(b, mp // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M, cin), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wmid.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bs.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_film, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_film, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M, cin), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wmid.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bs.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_film, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_film, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, mp, cin), jnp.float32),
            jax.ShapeDtypeStruct((cin, h), jnp.float32),
            jax.ShapeDtypeStruct(wmid.shape, jnp.float32),
            jax.ShapeDtypeStruct(bs.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, n_film, h), jnp.float32),
            jax.ShapeDtypeStruct((b, n_film, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, TILE_M, h), jnp.float32),       # pre-acts a_i
            pltpu.VMEM((L - 1, TILE_M, h), jnp.bfloat16),  # layer inputs
        ],
        interpret=interpret,
    )(xp, w0k.astype(jnp.float32), wmid.astype(jnp.bfloat16),
      bs.astype(jnp.float32), gammas.astype(jnp.float32),
      betas.astype(jnp.float32), dyp)
    return (dx[:, :m0].astype(x.dtype), dw0.astype(w0k.dtype),
            dwm.astype(wmid.dtype), db.astype(bs.dtype),
            dg.astype(gammas.dtype), dbt.astype(betas.dtype))


siren_trunk.defvjp(_trunk_fwd_rule, _trunk_bwd_rule)
