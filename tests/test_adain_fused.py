"""Fused instance-norm epilogue kernel (ops/pallas/adain.py): value and
gradient parity vs the plain XLA chain, plus in-model wiring parity for
both hologan sides (interpret-mode Pallas on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_gan_zoo_tpu.ops.pallas.adain import (
    eligible, fused_adain_act, plain_adain_act)


def _data(key, shape, cdim, dtype=jnp.float32):
    kx, ks, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, shape, jnp.float32) * 1.7 + 0.3
    s = jax.random.normal(ks, (shape[0], cdim), jnp.float32) + 1.0
    b = jax.random.normal(kb, (shape[0], cdim), jnp.float32) * 0.5
    return x.astype(dtype), s.astype(dtype), b.astype(dtype)


@pytest.mark.parametrize("shape,slope", [
    ((2, 16, 16, 64), 0.0),        # GenBlock2D-like
    ((2, 8, 8, 8, 32), 0.0),       # GenBlock3D-like (NDHWC)
    ((3, 16, 8, 128), 0.2),        # DiscBlock-like (leaky)
])
def test_forward_parity(shape, slope):
    x, s, b = _data(jax.random.PRNGKey(0), shape, shape[-1])
    got = fused_adain_act(x, s, b, 1e-5, slope, True)
    want = plain_adain_act(x, s, b, 1e-5, slope)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    x, s, b = _data(jax.random.PRNGKey(1), (2, 16, 16, 64), 64,
                    jnp.bfloat16)
    got = fused_adain_act(x, s, b, 1e-8, 0.0, True)
    want = plain_adain_act(x, s, b, 1e-8, 0.0)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.02, atol=0.02)


@pytest.mark.parametrize("slope", [0.0, 0.2])
def test_gradient_parity(slope):
    x, s, b = _data(jax.random.PRNGKey(2), (2, 8, 8, 64), 64)
    w = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def loss(fn, x, s, b):
        return jnp.sum(fn(x, s, b) * w)

    gx, gs, gb = jax.grad(
        lambda *a: loss(lambda x, s, b: fused_adain_act(
            x, s, b, 1e-5, slope, True), *a), argnums=(0, 1, 2))(x, s, b)
    rx, rs, rb = jax.grad(
        lambda *a: loss(lambda x, s, b: plain_adain_act(
            x, s, b, 1e-5, slope), *a), argnums=(0, 1, 2))(x, s, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=2e-4, atol=2e-5)


def test_non_affine_instance_norm_path():
    """DiscBlock usage: scale=1, bias=0 reduces to plain InstanceNorm."""
    x, _, _ = _data(jax.random.PRNGKey(4), (2, 8, 16, 64), 64)
    ones = jnp.ones((2, 64), jnp.float32)
    got = fused_adain_act(x, ones, jnp.zeros_like(ones), 1e-5, 0.2, True)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    want = jax.nn.leaky_relu((x - mean) * jax.lax.rsqrt(var + 1e-5), 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_eligibility():
    assert eligible(4096, 64)
    assert not eligible(100, 64)           # spatial not sublane-aligned
    assert not eligible(8, 64)             # too small to pay for a kernel
    assert not eligible(64 * 64 * 64, 64)  # exceeds the VMEM budget


def _gen_cfg():
    view_args = dict(azimuth_low=220, azimuth_high=320, elevation_low=70,
                     elevation_high=110, scale_low=1.0, scale_high=1.0,
                     transX_low=0, transX_high=0, transY_low=0,
                     transY_high=0, transZ_low=0, transZ_high=0)
    return dict(in_planes=16, out_planes=3, z_planes=32,
                view_args=view_args, img_size=64, resample="gather")


def test_generator_wiring_parity():
    """Whole-model check: fused_adain=interpret matches =never, identical
    params, on the real hologan Generator graph."""
    from lightning_gan_zoo_tpu.models.hologan import Generator
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 32))
    view = jnp.zeros((2, 6)).at[:, 2].set(1.0)
    plain = Generator(fused_adain="never", **_gen_cfg())
    fused = Generator(fused_adain="interpret", **_gen_cfg())
    params = plain.init({"params": jax.random.PRNGKey(6)}, z, view_in=view)
    y0 = plain.apply(params, z, view_in=view)
    y1 = fused.apply(params, z, view_in=view)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


def test_discriminator_wiring_parity():
    from lightning_gan_zoo_tpu.models.hologan import Discriminator
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3))
    plain = Discriminator(in_planes=3, out_planes=16, z_planes=32,
                          fused_norm="never")
    fused = Discriminator(in_planes=3, out_planes=16, z_planes=32,
                          fused_norm="interpret")
    variables = plain.init(jax.random.PRNGKey(8), x)
    y0, z0 = plain.apply(variables, x, mutable=["spectral"])[0]
    y1, z1 = fused.apply(variables, x, mutable=["spectral"])[0]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               rtol=2e-4, atol=2e-4)
