"""W-chunked lane-packed conv (ops/lane_pack.py): exactness vs lax conv,
gradients, second order (the R1 grad-of-grad path), and module wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from lightning_gan_zoo_tpu.ops.lane_pack import (LaneConv, chunk_conv,
                                                 fast_conv, pick_chunk)


def _ref(x, w):
    kh, kw = w.shape[:2]
    return lax.conv_general_dilated(
        x, w, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


SHAPES = [  # (h, w, ci, co, k)
    (16, 16, 16, 16, 3),   # the R1 128²-level shape class (chunk 8)
    (16, 32, 3, 16, 3),    # D conv_img (rgb in, chunk 8)
    (16, 16, 16, 3, 3),    # G conv_img (rgb out, chunk 8)
    (16, 16, 16, 32, 3),   # boundary block 16→32 (chunk 4)
    (16, 16, 32, 32, 3),   # 64²-level class (chunk 4)
    (16, 16, 64, 64, 3),   # chunk 2
    (12, 20, 16, 16, 5),   # 5×5 (half=2 edge cols)
]


@pytest.mark.parametrize("h,w,ci,co,k", SHAPES)
def test_forward_matches_lax_conv(h, w, ci, co, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype(np.float32))
    ker = jnp.asarray(rng.normal(size=(k, k, ci, co)).astype(np.float32))
    chunk = pick_chunk(ci, co, w, k)
    assert chunk > 1, "these shapes should all pack"
    np.testing.assert_allclose(np.asarray(chunk_conv(x, ker, chunk)),
                               np.asarray(_ref(x, ker)),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    ker = jnp.asarray(rng.normal(size=(3, 3, 16, 16)).astype(np.float32))
    chunk = pick_chunk(16, 16, 16, 3)
    assert chunk == 8
    cot = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))

    def loss(f):
        return lambda x, k: (f(x, k) * cot).sum()

    g0 = jax.grad(loss(_ref), argnums=(0, 1))(x, ker)
    g1 = jax.grad(loss(lambda x, k: chunk_conv(x, k, chunk)),
                  argnums=(0, 1))(x, ker)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_grad_of_grad_matches():
    """The R1 penalty differentiates ||∇_x D||² wrt params — second order
    through the packed conv must match plain-conv autodiff."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    ker = jnp.asarray(rng.normal(size=(3, 3, 16, 16)).astype(np.float32))

    def penalty(conv):
        def p(k):
            g = jax.grad(lambda xx: conv(xx, k).sum())(x)
            return (g ** 2).sum()
        return p

    h0 = jax.grad(penalty(_ref))(ker)
    h1 = jax.grad(penalty(lambda x, k: chunk_conv(x, k, 8)))(ker)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               rtol=2e-4, atol=2e-4)


def test_fast_conv_matches_plain_everywhere():
    """fast_conv: identical forward (same primitive), packed-backward dx/dw
    and second order match plain autodiff."""
    rng = np.random.default_rng(5)
    for ci, co in [(16, 16), (3, 16), (16, 3), (16, 32)]:
        x = jnp.asarray(rng.normal(size=(2, 8, 16, ci)).astype(np.float32))
        ker = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(2, 8, 16, co)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(fast_conv(x, ker)),
                                      np.asarray(_ref(x, ker)))
        g0 = jax.grad(lambda x, k: (_ref(x, k) * cot).sum(),
                      argnums=(0, 1))(x, ker)
        g1 = jax.grad(lambda x, k: (fast_conv(x, k) * cot).sum(),
                      argnums=(0, 1))(x, ker)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)

    # second order (R1 penalty): d/dk of ||grad_x sum conv||²
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    ker = jnp.asarray(rng.normal(size=(3, 3, 16, 16)).astype(np.float32))

    def penalty(conv):
        def p(k):
            g = jax.grad(lambda xx: conv(xx, k).sum())(x)
            return (g ** 2).sum()
        return p

    h0 = jax.grad(penalty(_ref))(ker)
    h1 = jax.grad(penalty(fast_conv))(ker)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               rtol=2e-4, atol=2e-4)


def test_pick_chunk_fallbacks():
    assert pick_chunk(128, 128, 64, 3) == 1      # full lanes already
    assert pick_chunk(16, 16, 128, 3) == 8
    assert pick_chunk(16, 32, 128, 3) == 4
    assert pick_chunk(32, 32, 64, 3) == 4
    assert pick_chunk(64, 64, 32, 3) == 2
    assert pick_chunk(16, 16, 6, 3) == 2         # W must divide
    assert pick_chunk(16, 16, 7, 3) == 1         # odd W → no pack
    assert pick_chunk(16, 16, 128, 33) == 1      # kw//2 >= chunk


def test_laneconv_params_interchangeable_with_nn_conv():
    """LaneConv stores 'kernel' (HWIO) / 'bias' exactly like nn.Conv, so R1
    checkpoints are identical between packed and plain builds."""
    from flax import linen as nn
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    lc = LaneConv(16, (3, 3))
    vars_lc = lc.init(jax.random.PRNGKey(0), x)
    ref_conv = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)])
    y_ref = ref_conv.apply(vars_lc, x)  # same param tree works in nn.Conv
    y_lc = lc.apply(vars_lc, x)
    np.testing.assert_allclose(np.asarray(y_lc), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_resnet_r1_superstep_lane_pack_matches_plain():
    """Full R1 G forward + D R1 penalty agree between packed and plain
    builds (same params; f32 to keep the comparison tight)."""
    from lightning_gan_zoo_tpu.models.resnet_stability import (Discriminator,
                                                               Generator)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))

    g_pack = Generator(z_dim=8, size=32, nfilter=16, nfilter_max=64,
                       lane_pack=True)
    g_plain = Generator(z_dim=8, size=32, nfilter=16, nfilter_max=64,
                        lane_pack=False)
    gv = g_pack.init(jax.random.PRNGKey(0), z)
    np.testing.assert_allclose(np.asarray(g_plain.apply(gv, z)),
                               np.asarray(g_pack.apply(gv, z)),
                               rtol=1e-4, atol=1e-4)

    d_pack = Discriminator(z_dim=8, size=32, nfilter=16, nfilter_max=64,
                           lane_pack=True)
    d_plain = Discriminator(z_dim=8, size=32, nfilter=16, nfilter_max=64,
                            lane_pack=False)
    dv = d_pack.init(jax.random.PRNGKey(1), x)

    def r1(model, variables):
        def f(xx):
            return model.apply(variables, xx).sum()
        g = jax.grad(f)(x)
        return (g ** 2).sum()

    np.testing.assert_allclose(float(r1(d_plain, dv)), float(r1(d_pack, dv)),
                               rtol=1e-3)
