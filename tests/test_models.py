"""Golden-shape and behaviour tests for the 2D model zoo (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_gan_zoo_tpu.models import dcgan, resnet_stability
from lightning_gan_zoo_tpu.models.layers import (InstanceNorm, AdaIN,
                                                 ZMapping, CoordConv,
                                                 SpectralNormConv,
                                                 upsample2_nearest)


@pytest.mark.parametrize("img_size", [16, 32, 64])
def test_dcgan_generator_shapes(img_size):
    g = dcgan.Generator(channels_noise=16, channels_img=3, features_g=8,
                        img_size=img_size)
    z = jnp.zeros((2, 16))
    v = g.init(jax.random.PRNGKey(0), z, train=False)
    out = g.apply(v, z, train=False)
    assert out.shape == (2, img_size, img_size, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh range


@pytest.mark.parametrize("img_size,norm", [(16, "batch_norm"),
                                           (32, "instance_norm2d"),
                                           (64, "identity")])
def test_dcgan_discriminator_shapes(img_size, norm):
    d = dcgan.Discriminator(channels_img=3, features_d=8, norm=norm,
                            img_size=img_size, final_sigmoid=False)
    x = jnp.zeros((2, img_size, img_size, 3))
    v = d.init(jax.random.PRNGKey(0), x, train=False)
    out = d.apply(v, x, train=False)
    assert out.shape == (2,)


def test_dcgan_final_sigmoid_range():
    d = dcgan.Discriminator(channels_img=1, features_d=8, img_size=16,
                            final_sigmoid=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 16, 1)),
                    jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x, train=False)
    out = d.apply(v, x, train=False)
    assert np.all((out >= 0) & (out <= 1))


@pytest.mark.parametrize("size", [16, 32])
def test_resnet_stability_shapes(size):
    g = resnet_stability.Generator(z_dim=16, size=size, nfilter=4,
                                   nfilter_max=32)
    z = jnp.zeros((2, 16))
    gv = g.init(jax.random.PRNGKey(0), z, train=False)
    img = g.apply(gv, z, train=False)
    assert img.shape == (2, size, size, 3)

    d = resnet_stability.Discriminator(z_dim=16, size=size, nfilter=4,
                                       nfilter_max=32)
    dv = d.init(jax.random.PRNGKey(1), img, train=False)
    out = d.apply(dv, img, train=False)
    assert out.shape == (2,)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))  # baked-in sigmoid


def test_instance_norm_matches_manual():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 3)) * 5 + 2,
                    jnp.float32)
    m = InstanceNorm()
    v = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(v, x))
    manual = (np.asarray(x) - np.asarray(x).mean((1, 2), keepdims=True)) / \
        np.sqrt(np.asarray(x).var((1, 2), keepdims=True) + 1e-5)
    assert np.allclose(y, manual, atol=1e-4)


def test_adain_applies_external_stats():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 4, 3)),
                    jnp.float32)
    scale = jnp.ones((2, 3)) * 2.0
    bias = jnp.ones((2, 3)) * 0.5
    m = AdaIN()
    y = np.asarray(m.apply({}, x, scale, bias))
    assert np.allclose(y.mean((1, 2)), 0.5, atol=1e-3)
    assert np.allclose(y.std((1, 2)), 2.0, atol=1e-2)


def test_zmapping_shapes():
    m = ZMapping(out_channels=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))
    s, b = m.apply(v, jnp.zeros((2, 16)))
    assert s.shape == (2, 8) and b.shape == (2, 8)


def test_coordconv_appends_coords():
    m = CoordConv(features=4, kernel_size=(1, 1))
    x = jnp.zeros((1, 8, 8, 2))
    v = m.init(jax.random.PRNGKey(0), x)
    # kernel input channels = 2 image + 2 coord channels
    assert v["params"]["Conv_0"]["kernel"].shape == (1, 1, 4, 4)


def test_spectral_norm_bounds_singular_value():
    m = SpectralNormConv(features=8, kernel_size=(3, 3))
    x = jnp.zeros((1, 8, 8, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda p: p * 50.0, v["params"])  # inflate weights
    state = {"spectral": v["spectral"]}
    # run a few power-iteration steps to converge u
    for _ in range(20):
        _, upd = m.apply({"params": params, **state}, x,
                         mutable=["spectral"])
        state = dict(upd)
    w = np.asarray(params["kernel"]).reshape(-1, 8)
    u = np.asarray(state["spectral"]["u"])
    v_vec = w @ u
    v_vec /= np.linalg.norm(v_vec)
    sigma = float(v_vec @ (w @ (w.T @ v_vec)) / np.linalg.norm(w.T @ v_vec))
    true_sigma = np.linalg.svd(w, compute_uv=False)[0]
    assert abs(sigma - true_sigma) / true_sigma < 0.05


def test_upsample2_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = np.asarray(upsample2_nearest(x))
    assert y.shape == (1, 4, 4, 1)
    assert np.all(y[0, :2, :2, 0] == 0)
    assert np.all(y[0, 2:, 2:, 0] == 3)


def test_spectral_norm_gradient_matches_torch():
    """torch.nn.utils.spectral_norm lets gradients flow through
    sigma = u^T W v (u/v detached); the kernel gradient must match torch's
    including the -W*dsigma/dW/sigma^2 term."""
    import torch
    import torch.nn.utils as tnu

    kh = kw = 3
    cin, cout = 4, 8
    rng = np.random.default_rng(3)
    w_oihw = rng.normal(size=(cout, cin, kh, kw)).astype(np.float32)
    x_nchw = rng.normal(size=(2, cin, 8, 8)).astype(np.float32)

    tconv = torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w_oihw))
    tconv = tnu.spectral_norm(tconv, n_power_iterations=1)
    u0 = np.full((cout,), 1.0 / np.sqrt(cout), np.float32)
    with torch.no_grad():
        tconv.weight_u.copy_(torch.from_numpy(u0))
    tx = torch.from_numpy(x_nchw)
    ty = tconv(tx)
    ty.sum().backward()
    tgrad = tconv.weight_orig.grad.numpy()  # (out, in, kh, kw)

    m = SpectralNormConv(features=cout, kernel_size=(kh, kw), use_bias=False)
    kernel_hwio = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))
    variables = {"params": {"kernel": kernel_hwio},
                 "spectral": {"u": jnp.asarray(u0)}}
    xj = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))

    def loss(params):
        y, _ = m.apply({"params": params, "spectral": variables["spectral"]},
                       xj, mutable=["spectral"])
        return jnp.sum(y)

    y_j, _ = m.apply(variables, xj, mutable=["spectral"])
    np.testing.assert_allclose(
        np.transpose(np.asarray(y_j), (0, 3, 1, 2)),
        ty.detach().numpy(), rtol=2e-4, atol=2e-4)
    g = jax.grad(loss)({"kernel": kernel_hwio})["kernel"]
    np.testing.assert_allclose(
        np.transpose(np.asarray(g), (3, 2, 0, 1)), tgrad,
        rtol=2e-4, atol=2e-4)


def test_avg_pool_mxu_matches_reduce_window():
    """avg_pool_mxu (diagonal-kernel conv) must equal nn.avg_pool with
    count_include_pad=True at every R1 stage shape."""
    from flax import linen as nn
    from lightning_gan_zoo_tpu.models.layers import avg_pool_mxu

    rng = np.random.default_rng(7)
    for h, c in [(128, 16), (64, 32), (9, 64), (8, 256)]:
        x = jnp.asarray(rng.normal(size=(2, h, h, c)).astype(np.float32))
        want = nn.avg_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)], count_include_pad=True)
        got = avg_pool_mxu(x, window=3, stride=2, pad=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_conv_s2d_equals_plain_conv():
    """Space-to-depth conv oracle (ops/space_to_depth.py — documented
    negative perf result, kept correctness-pinned)."""
    from lightning_gan_zoo_tpu.ops.space_to_depth import (
        conv_s2d, depth_to_space, space_to_depth)

    rng = np.random.default_rng(11)
    for (h, ci, co, k) in [(16, 16, 16, 3), (8, 4, 8, 3), (12, 5, 7, 5),
                           (8, 2, 3, 1)]:
        x = jnp.asarray(rng.normal(size=(2, h, h, ci)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, ci, co)).astype(np.float32))
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(k // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(conv_s2d(x, w)),
                                   np.asarray(want), atol=1e-4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))
