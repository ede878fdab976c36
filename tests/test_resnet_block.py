"""Fused ResNet-block Pallas kernel (ops/pallas/resnet_block.py): value,
gradient, and R1 second-order parity, plus in-module wiring and
checkpoint-name compatibility.

Reference semantics: gan_stability ResnetBlock — two SAME 3x3 convs with
pre-activation LeakyReLU(0.2) (/root/reference/core/submodules/gan_stability/
models/resnet.py:97-129).

Comparison strategy: the kernel computes bf16-input/f32-accum matmuls, so
the reference here is a bf16-MATCHED twin of the plain core (inputs
rounded to bf16, f32 math) — with identical input rounding the LeakyReLU
masks agree everywhere except where a pre-activation lands within f32
ACCUMULATION-ORDER noise of zero. Those measure-zero borderline positions
(threshold 1e-4 of scale, 3x3-dilated — a flipped mask perturbs every dx
within the tap radius) are excluded from the dx assertions and the
remaining error must sit at accumulation-noise level. fused-vs-plain-f32
agreement is separately pinned loosely (the bf16 rounding itself)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_gan_zoo_tpu.ops.pallas.resnet_block import (
    _bwd, eligible, fused_block_core, plain_core)

RNG = np.random.default_rng(7)


def _mk(h, w, ci, fh, fo, b=2):
    return tuple(
        jnp.asarray(RNG.normal(size=s) * sc, jnp.float32) for s, sc in
        [((b, h, w, ci), 1.0), ((3, 3, ci, fh), 0.2), ((fh,), 0.1),
         ((3, 3, fh, fo), 0.2), ((fo,), 0.1)])


def _rb(t):
    """Round-through-bf16 (the kernel's input precision)."""
    return t.astype(jnp.bfloat16).astype(jnp.float32)


def _conv(h, k):
    return jax.lax.conv_general_dilated(
        h, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _leaky(t):
    return jnp.where(t >= 0, t, 0.2 * t)


def _leaky_in_bf16(t):
    """The kernel casts the bf16 input slab to f32, applies LeakyReLU in
    f32 (Mosaic's vector compare has no bf16 path on v5e) and re-rounds the
    result to bf16 for the matmul."""
    return _rb(_leaky(_rb(t)))


def plain_core_bf16(x, w1, b1, w2, b2):
    """bf16-matched twin: every kernel matmul input rounded to bf16, math
    in f32 — mask decisions match the Pallas kernel's up to f32
    accumulation order."""
    v = _leaky_in_bf16(x)
    u = _conv(v, _rb(w1)) + _rb(b1)
    w = _rb(_leaky(u))          # U is f32 in-kernel; act there is exact
    return _conv(w, _rb(w2)) + _rb(b2)


def _u_of(args):
    x, w1, b1, _, _ = args
    return _conv(_leaky_in_bf16(x), _rb(w1)) + _rb(b1)


def _dilate3(m):
    p = np.pad(m, ((0, 0), (1, 1), (1, 1)))
    out = np.zeros_like(m)
    for dy in range(3):
        for dx in range(3):
            out |= p[:, dy:dy + m.shape[1], dx:dx + m.shape[2]]
    return out


def _borderline(args):
    """(B, H, W, Ci) elements where dx may differ by an accumulation-order
    mask flip: a near-zero |U| anywhere in the 3x3 neighbourhood perturbs
    every channel of dx through conv1^T (position-level, dilated), while a
    near-zero |x| only flips act'(x) at that exact ELEMENT."""
    u = np.asarray(_u_of(args))
    x = np.asarray(args[0])
    near_u = _dilate3((np.abs(u) < 1e-4 * np.abs(u).max()).any(-1))
    near_x = np.abs(x) < 4e-3 * np.abs(x).max()
    mask = near_u[..., None] | near_x
    assert mask.mean() < 0.3, "degenerate test data"
    return mask


def _assert_dx(a, r, mask, name, tol):
    d = np.abs(np.asarray(a) - np.asarray(r))
    scale = np.abs(np.asarray(r)).max() + 1e-9
    clean = d[~mask] / scale
    assert clean.max() < tol, (name, float(clean.max()), float(mask.mean()))
    assert d.max() / scale < 0.3, (name, float(d.max() / scale))


def _assert_flat(a, r, name, tol):
    d = np.abs(np.asarray(a) - np.asarray(r))
    scale = np.abs(np.asarray(r)).max() + 1e-9
    assert d.max() / scale < tol, (name, float(d.max() / scale))


SHAPES = [(16, 16, 8, 8, 8),      # square, uniform channels
          (16, 32, 32, 16, 32),   # channel change across the block
          (8, 16, 16, 16, 8)]     # wide-to-narrow


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_plain(shape):
    args = _mk(*shape)
    assert eligible(*shape)
    y = fused_block_core(*args, True)
    # tight vs the bf16-matched twin; loose vs full f32
    _assert_flat(y, plain_core_bf16(*args), "fwd_bf16twin", 2e-3)
    _assert_flat(y, plain_core(*args), "fwd_f32", 2e-2)


@pytest.mark.parametrize("shape", SHAPES)
def test_backward_op_matches_vjp(shape):
    """The hand-written backward kernels against jax.vjp of the
    bf16-matched twin at the SAME cotangent."""
    h, w, ci, fh, fo = shape
    args = _mk(*shape)
    g = jnp.asarray(RNG.normal(size=(2, h, w, fo)), jnp.float32)
    outs = _bwd(*args, g, interpret=True)
    _, vjp = jax.vjp(plain_core_bf16, *args)
    refs = vjp(g)
    _assert_dx(outs[0], refs[0], _borderline(args), "dx", 1.5e-2)
    for name, a, r in zip(["dw1", "db1", "dw2", "db2"], outs[1:], refs[1:]):
        _assert_flat(a, r, name, 1.5e-2)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_grad_through_custom_vjp(shape):
    """End-to-end jax.grad through the fused op vs the bf16-matched twin
    (the loss cotangent additionally carries forward rounding noise)."""
    args = _mk(*shape)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a) * 0.3))

    gf = jax.grad(loss(lambda *a: fused_block_core(*a, True)),
                  argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss(plain_core_bf16), argnums=(0, 1, 2, 3, 4))(*args)
    _assert_dx(gf[0], gr[0], _borderline(args), "dx", 1e-2)
    for name, a, r in zip(["dw1", "db1", "dw2", "db2"], gf[1:], gr[1:]):
        _assert_flat(a, r, name, 1.5e-2)


def test_r1_second_order_matches_plain():
    """grad-of-grad through the fused op (the R1 penalty path,
    reference core/utils/utils.py:60-69): the second order lowers through
    the plain-XLA twin of the hand-written backward. Compared against the
    bf16-matched reference, borderline positions excluded for the
    x-gradient."""
    args = _mk(16, 16, 8, 8, 8)

    def r1(fn, x, *params):
        g = jax.grad(lambda xx: jnp.sum(fn(xx, *params)))(x)
        return jnp.sum(g * g)

    mask = _borderline(args)
    for argnum in range(5):
        a = jax.grad(lambda *a: r1(
            lambda x, *p: fused_block_core(x, *p, True), *a),
            argnums=argnum)(*args)
        b = jax.grad(lambda *a: r1(plain_core_bf16, *a),
                     argnums=argnum)(*args)
        if argnum == 0:
            _assert_dx(a, b, mask, "d2x", 3e-2)
        else:
            _assert_flat(a, b, f"arg{argnum}", 3e-2)


def test_r1_second_order_bf16_inputs():
    """Regression (round-4 advisor, high): the production fuse='auto' path
    feeds bf16 activations, and the R1 double-backward lowers through
    plain_core — if _leaky silently promotes to f32, jax.vjp raises a
    cotangent dtype mismatch (f32 primal out vs bf16 cotangent). Pin that
    plain_core is dtype-preserving and the full grad-of-grad runs and
    roughly matches the f32 result."""
    args_f32 = _mk(16, 16, 8, 8, 8)
    args_bf16 = tuple(a.astype(jnp.bfloat16) for a in args_f32)

    assert plain_core(*args_bf16).dtype == jnp.bfloat16

    def r1(fn, x, *params):
        g = jax.grad(lambda xx: jnp.sum(
            fn(xx, *params).astype(jnp.float32)))(x)
        return jnp.sum(g.astype(jnp.float32) ** 2)

    for fn in (plain_core,
               lambda x, *p: fused_block_core(x, *p, True)):
        got = jax.grad(lambda *a: r1(fn, *a), argnums=1)(*args_bf16)
        ref = jax.grad(lambda *a: r1(plain_core, *a), argnums=1)(*args_f32)
        assert got.dtype == jnp.bfloat16
        got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
        assert err < 0.15, f"bf16 second-order rel err {err}"


def test_eligibility_gate():
    assert not eligible(16, 16, 8, 128, 8)    # fh over the lane budget
    assert not eligible(16, 16, 8, 8, 128)    # fo over the lane budget
    assert not eligible(2, 16, 8, 8, 8)       # H too small
    assert eligible(128, 128, 16, 16, 16)     # the r1 hot block
    assert eligible(64, 64, 16, 16, 32)       # D 16->32 level
    assert eligible(32, 32, 32, 32, 64)       # D 32->64 level


def test_module_wiring_and_checkpoint_names():
    """ResnetBlock(fuse='interpret') runs the kernel through the flax
    module and produces the SAME param tree (names + shapes) as the plain
    build — checkpoints are interchangeable."""
    from lightning_gan_zoo_tpu.models.resnet_stability import ResnetBlock

    x = jnp.asarray(RNG.normal(size=(2, 16, 16, 8)), jnp.float32)
    fused = ResnetBlock(fout=16, fuse="interpret")
    plain = ResnetBlock(fout=16, fuse="never")
    vf = fused.init(jax.random.PRNGKey(0), x)
    vp = plain.init(jax.random.PRNGKey(0), x)
    sf = jax.tree.map(lambda a: (a.shape, str(a.dtype)), vf)
    sp = jax.tree.map(lambda a: (a.shape, str(a.dtype)), vp)
    assert sf == sp
    # value parity through the module, SAME params both ways
    yf = fused.apply(vp, x)
    yp = plain.apply(vp, x)
    _assert_flat(yf, yp, "module", 2e-2)
