"""Pallas trilinear kernel vs the XLA gather reference (interpret mode on
CPU; the same kernel compiles natively on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from lightning_gan_zoo_tpu.ops.grid_sample import trilinear_resample
from lightning_gan_zoo_tpu.ops.pallas.trilinear import (
    trilinear_resample_mxu, _forward, _backward_vox)


def _setup(b=2, s=8, c=16, n=100, seed=0):
    rng = np.random.default_rng(seed)
    vox = jnp.asarray(rng.normal(size=(b, s, s, s, c)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-1.0, s, size=(b, n, 3)), jnp.float32)
    return vox, pts


def test_forward_matches_gather_reference():
    vox, pts = _setup()
    got = _forward(vox, pts, interpret=True)
    expect = trilinear_resample(vox, pts)
    # kernel matmuls run in bf16 (matching the MXU's f32 decomposition)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=3e-2)


def test_forward_out_of_range_border_clamp():
    vox, _ = _setup(n=4)
    pts = jnp.asarray([[[-5.0, -5.0, -5.0], [100.0, 100.0, 100.0],
                        [0.0, 0.0, 0.0], [7.0, 7.0, 7.0]]])
    pts = jnp.broadcast_to(pts, (2, 4, 3))
    got = np.asarray(_forward(vox, pts, interpret=True))
    expect = np.asarray(trilinear_resample(vox, pts))
    np.testing.assert_allclose(got, expect, atol=3e-2)


def test_vjp_matches_gather_reference():
    vox, pts = _setup(b=1, s=4, c=8, n=60)
    g = jnp.ones((1, 60, 8))

    def f_pallas(v):
        return jnp.sum(trilinear_resample_mxu(v, pts, True) * g)

    def f_ref(v):
        return jnp.sum(trilinear_resample(v, pts) * g)

    d_pallas = jax.grad(f_pallas)(vox)
    d_ref = jax.grad(f_ref)(vox)
    np.testing.assert_allclose(np.asarray(d_pallas), np.asarray(d_ref),
                               atol=3e-2)  # bf16 matmul precision


def test_backward_accumulates_over_tiles():
    # >TILE_N points forces the multi-tile accumulation path
    vox, pts = _setup(b=1, s=4, c=8, n=600, seed=3)
    g = jnp.asarray(np.random.default_rng(4).normal(size=(1, 600, 8)),
                    jnp.float32)
    _, d, h, w, c = vox.shape
    dvox = _backward_vox(pts, g, d, h, w, c, interpret=True)

    def f_ref(v):
        return jnp.sum(trilinear_resample(v, pts) * g)

    d_ref = jax.grad(f_ref)(vox)
    np.testing.assert_allclose(np.asarray(dvox), np.asarray(d_ref),
                               atol=6e-2)  # bf16 + multi-tile accumulation
