"""Lane packing for low-channel stride-1 convs (the R1 ResNet hot path).

STATUS: NEGATIVE RESULT, kept as tested opt-in oracles. Plain XLA convs
remain the default (``lane_pack=False`` in models/resnet_stability.py).
This module is the full record of a four-formulation, profile-driven
attack on the R1 conv lane ceiling — the measurements below are the reason
no packing is enabled, and the bar any future attempt has to clear.

THE PROBLEM. The R1 ResNet (conf/expt/gan_stability_r1.yaml: nfilter=16)
spends most of its superstep in 128²/64² stride-1 3×3 convs with 16/32
channels. A conv's MXU lane dimension is its output-channel count, so a
16-channel conv nominally occupies ≤16 of 128 lanes. Isolated-op traces on
v5e (batch 64, 128²×16→16, bf16, device time via jax.profiler):

    XLA plain:   fwd 0.186 ms (26 TF/s) · dx 0.348 ms (14 TF/s)
                 · dw 1.292 ms (3.7 TF/s — a (3,3,16,16) kernel-grad
                   through a 16×16 corner of the MXU)

FORMULATIONS BUILT AND MEASURED (all parity-tested incl. R1 second order):

  1. space-to-depth (ops/space_to_depth.py, round 1): 4× lanes at 4×
     FLOPs — cancels exactly. NEGATIVE.
  2. output-tile strided conv (kernel (kh+jy-1, kw+jx-1), stride (jy,jx),
     jy·jx·co lanes) + depth-to-space: 37.5% MXU utilisation on paper, but
     the d2s relayout after EVERY conv materialises as XLA copies and
     breaks elementwise fusion. E2E gan_stability_r1: 6,343 → 4,222 img/s.
     NEGATIVE (formulation dropped; chunk_conv below supersedes it).
  3. W-chunked lanes, whole level held in the view (chunk_conv_packed):
     (B,H,W,C) → (B,H,W/chunk,chunk·C) is row-major-free, the conv becomes
     a (kh,1) 128→128 center conv (measured 85% of MXU peak inside fused
     chains) + one J-dilated edge conv. Isolated: fwd 0.218 ms, dx 0.861,
     dw 0.449. E2E: 5,789 img/s — still NEGATIVE (edge convs + boundary
     relayouts + lost cross-op fusion eat the core win).
  4. hybrid custom VJP (fast_conv): XLA's plain forward + packed dx/dw.
     Per-op arithmetic says ~1.9× on conv cost; E2E: 5,055 img/s —
     NEGATIVE (custom_vjp fences XLA's whole-graph fusion, and the R1
     grad-of-grad differentiates through the packed bwd graph, which
     lowers worse than XLA's native double-backward of a plain conv).

CONCLUSION. XLA's conv emitter is already well above the naive lane model
inside real fused graphs (fwd ~60 TF/s useful in-context vs 26 isolated),
and its global fusion across the superstep is worth more than any local
lane-utilisation fix expressible at the XLA level. Beating it would need a
Pallas kernel fusing whole ResNet blocks (conv+act+conv+residual) with
in-VMEM intermediates — noted in ROADMAP.md as the only remaining lever.

Reference counterpart of the op being attacked:
/root/reference/core/submodules/gan_stability/models/resnet.py:100-126.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _pow2ceil(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def pick_chunk(ci: int, co: int, w: int, kw: int) -> int:
    """Columns per 128-lane chunk; 1 means 'don't pack'."""
    chunk = 128 // max(_pow2ceil(ci), _pow2ceil(co))
    while chunk > 1 and w % chunk:
        chunk //= 2
    if chunk <= 1 or kw // 2 >= chunk or co >= 128 or w < 2 * chunk:
        return 1
    return chunk


@functools.lru_cache(maxsize=None)
def _chunk_onehots(kh: int, kw: int, ci: int, co: int, chunk: int):
    """One-hot scatter maps (kh·kw, ...) → packed (kh, lanes_in, lanes_out)
    weight layouts for the center / left / right contributions."""
    half = kw // 2
    # center: input col s (0..chunk) → output col dx, tap kx = s - dx + half
    cen = np.zeros((kh * kw, kh, chunk, chunk), np.float32)
    for ty in range(kh):
        for s in range(chunk):
            for dx in range(chunk):
                kx = s - dx + half
                if 0 <= kx < kw:
                    cen[ty * kw + kx, ty, s, dx] = 1.0
    # edges: ONE J-dilated conv covers both neighbours. The edge input is
    # the per-chunk lane concat [last `half` cols ‖ first `half` cols]; the
    # conv's J-window is (2 taps, dilation 2, SAME) so tap 0 reads chunk J-1
    # (its LAST cols feed low dx) and tap 1 reads chunk J+1 (its FIRST cols
    # feed high dx). Zero weights kill the unused half of each tap, and the
    # conv's own padding supplies the J=0 / J=nj-1 zeros — no pad/shift ops.
    # edg[(ty,kx), ty', jt, u_slot, dx]
    edg = np.zeros((kh * kw, kh, 2, 2 * half, chunk), np.float32)
    for ty in range(kh):
        for ui, u in enumerate(range(chunk - half, chunk)):   # J-1, slot ui
            for dx in range(chunk):
                kx = (u - chunk) - dx + half
                if 0 <= kx < kw:
                    edg[ty * kw + kx, ty, 0, ui, dx] = 1.0
        for u in range(half):                                  # J+1, slot half+u
            for dx in range(chunk):
                kx = (u + chunk) - dx + half
                if 0 <= kx < kw:
                    edg[ty * kw + kx, ty, 1, half + u, dx] = 1.0
    return cen, edg


def _pack_weights(w: jax.Array, chunk: int):
    """w (kh, kw, ci, co) → Wc (kh, 1, chunk·ci, chunk·co) and the edge
    kernel We (kh, 2, 2·half·ci, chunk·co) for the J-dilated edge conv."""
    kh, kw, ci, co = w.shape
    half = kw // 2
    cen, edg = _chunk_onehots(kh, kw, ci, co, chunk)
    wf = w.reshape(kh * kw, ci, co)
    ohc = jnp.asarray(cen, w.dtype)  # (kh·kw, kh, chunk, chunk)
    wc = jnp.einsum("kco,ktsd->tscdo", wf, ohc)
    wc = wc.reshape(kh, 1, chunk * ci, chunk * co)
    if half == 0:
        return wc, None
    ohe = jnp.asarray(edg, w.dtype)  # (kh·kw, kh, 2, 2·half, chunk)
    we = jnp.einsum("kco,ktjud->tjucdo", wf, ohe)
    we = we.reshape(kh, 2, 2 * half * ci, chunk * co)
    return wc, we


def _conv_h(x: jax.Array, w: jax.Array) -> jax.Array:
    """(kh, 1) SAME conv over the (H, J) grid."""
    kh = w.shape[0]
    return lax.conv_general_dilated(
        x, w, (1, 1), [(kh // 2, kh // 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def chunk_view(x: jax.Array, chunk: int) -> jax.Array:
    """(B, H, W, C) → (B, H, W/chunk, chunk·C). Row-major contiguous — a
    pure reshape — but XLA may still relayout at the boundary, so callers
    should hold a whole resolution level in ONE view (resnet_stability
    chunks per level, unchunking only at pool/upsample boundaries)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // chunk, chunk * c)


def unchunk_view(xv: jax.Array, chunk: int) -> jax.Array:
    b, h, nj, cc = xv.shape
    return xv.reshape(b, h, nj * chunk, cc // chunk)


def chunk_conv_packed(xv: jax.Array, w: jax.Array, chunk: int) -> jax.Array:
    """Packed-in/packed-out conv: xv (B, H, J, chunk·Ci) → (B, H, J, chunk·Co)."""
    kh, kw, ci, co = w.shape
    half = kw // 2
    wc, we = _pack_weights(w, chunk)
    y = _conv_h(xv, wc)
    if half:
        # both neighbour-chunk edge columns in ONE lane slice-concat ...
        xe = jnp.concatenate([xv[..., (chunk - half) * ci:],
                              xv[..., :half * ci]], axis=-1)
        # ... consumed by ONE J-dilated 2-tap conv whose SAME padding does
        # the J∓1 shifts (no pad/shift ops materialise)
        ye = lax.conv_general_dilated(
            xe, we, (1, 1), [(kh // 2, kh // 2), (1, 1)],
            rhs_dilation=(1, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + ye
    return y


def chunk_conv(x: jax.Array, w: jax.Array, chunk: int) -> jax.Array:
    """SAME-padded stride-1 conv(x, w) in W-chunked lane layout.

    x: (B, H, W, Ci) with W % chunk == 0; w: (kh, kw, Ci, Co), odd kh/kw,
    kw//2 < chunk. Equals the plain lax conv exactly (tests/test_lane_pack.py
    pins fwd, grads, and the R1 grad-of-grad second order against it).
    """
    return unchunk_view(
        chunk_conv_packed(chunk_view(x, chunk), w, chunk), chunk)


def _plain_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    kh, kw = w.shape[:2]
    return lax.conv_general_dilated(
        x, w, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def fast_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Plain SAME stride-1 conv forward with a lane-packed backward.

    Measured on v5e (batch 64, 128²×16→16, bf16, trace device time):
    XLA's own lowering runs fwd 0.186 ms (26 TF/s), dx 0.348 ms (14 TF/s),
    dw 1.292 ms (3.7 TF/s) — the kernel-grad conv writes a (3,3,16,16)
    result through a 16×16 corner of the MXU and dominates training cost.
    In the W-chunked view the same dw is a (kh, 128, 128) full-tile
    contraction: 0.449 ms (2.9×). dx is itself a low-channel stride-1 conv,
    so it reuses the packed FORWARD form (0.218 ms). XLA's forward conv
    emitter is already above the naive lane model and stays plain.
    """
    return _plain_conv(x, w)


def _fast_conv_fwd(x, w):
    return _plain_conv(x, w), (x, w)


def _fast_conv_bwd(res, dy):
    x, w = res
    kh, kw, ci, co = w.shape
    wdt = x.shape[2]
    # dx: conv of dy with the 180°-rotated, io-transposed kernel — again a
    # low-channel stride-1 conv, packed when the shape allows
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    ch_dx = pick_chunk(co, ci, wdt, kw)
    dx = (chunk_conv(dy, w_rot, ch_dx) if ch_dx > 1
          else _plain_conv(dy, w_rot))
    # dw: through the packed graph, where the kernel-grad contraction fills
    # all 128 lanes
    ch_dw = pick_chunk(ci, co, wdt, kw)
    f = ((lambda kk: chunk_conv(x, kk, ch_dw)) if ch_dw > 1
         else (lambda kk: _plain_conv(x, kk)))
    _, vjp = jax.vjp(f, w)
    (dw,) = vjp(dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


fast_conv.defvjp(_fast_conv_fwd, _fast_conv_bwd)


class LaneConv(nn.Module):
    """Drop-in for nn.Conv(features, (k, k), SAME, stride 1) that keeps
    XLA's (good) forward conv but swaps in the lane-packed backward
    (fast_conv) when channels sit below the MXU lane ceiling. Parameter
    names/shapes match nn.Conv ('kernel' HWIO, 'bias'), so checkpoints are
    interchangeable with the plain-conv build.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    enabled: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ci = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, ci, self.features), jnp.float32)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        packable = (self.enabled and
                    max(pick_chunk(ci, self.features, x.shape[2], kw),
                        pick_chunk(self.features, ci, x.shape[2], kw)) > 1)
        y = fast_conv(x, kernel) if packable else _plain_conv(x, kernel)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
