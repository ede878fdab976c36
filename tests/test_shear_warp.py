"""Shear-decomposition warp: matrix-identity exactness, rot90 pinning,
smooth-content closeness to the gather reference, opt-in wiring."""
import jax
import jax.numpy as jnp
import numpy as np

from lightning_gan_zoo_tpu.models.hologan import (_rigid_matrices,
                                                  rigid_transform_volume)
from lightning_gan_zoo_tpu.ops import shear_warp as SW
from lightning_gan_zoo_tpu.ops.grid_sample import trilinear_resample


def _hologan_inv(rng, b=4, s=16):
    theta = np.deg2rad(rng.uniform(0, 360, b))
    gamma = np.deg2rad(rng.uniform(0, 180, b))
    view = jnp.asarray(np.stack([theta, gamma, np.ones(b), np.zeros(b),
                                 np.zeros(b), np.zeros(b)], 1), jnp.float32)
    m_fwd = _rigid_matrices(view)
    cen = jnp.eye(4).at[:3, 3].set(-s * 0.5)
    cen_n = jnp.eye(4).at[:3, 3].set(s * 0.5)
    return view, jnp.linalg.inv(cen_n[None] @ m_fwd @ cen[None])


def test_pass_sequence_matrix_identity():
    """The composed point map of all passes must equal the inverse affine
    EXACTLY — catches every factorisation/bookkeeping bug structurally."""
    rng = np.random.default_rng(0)
    _, inv = _hologan_inv(rng, b=8)
    comp = SW.composite_matrix(inv, 16, pad=4)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(inv), atol=1e-4)


def test_rot90_data_ops_match_their_matrices():
    rng = np.random.default_rng(1)
    p = 8
    vol = jnp.asarray(rng.normal(size=(4, p, p, p, 2)), jnp.float32)
    cc = (p - 1) / 2.0
    zz, yy, xx = jnp.meshgrid(jnp.arange(p), jnp.arange(p), jnp.arange(p),
                              indexing="ij")
    pts = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)],
                    -1).astype(jnp.float32)
    for plane in ("xz", "xy"):
        for k in range(4):
            koh = SW._rot90_k_onehot(jnp.full((4,), k, jnp.int32), plane)
            got = SW._rot90_onehot(vol, koh, plane)
            r = SW._plane_rotation(plane, jnp.full((4,), (jnp.pi / 2) * k), 4)
            pts_in = jnp.einsum("bij,nj->bni", r, pts - cc) + cc
            ref = trilinear_resample(vol, pts_in).reshape(4, p, p, p, 2)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4)


def test_identity_view_roundtrip():
    vol = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16, 16, 16, 4)),
                      jnp.float32)
    view = jnp.asarray(np.tile([0.0, 0, 1, 0, 0, 0], (2, 1)), jnp.float32)
    out = rigid_transform_volume(vol, view, resample="shear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-3)


def test_shear_close_to_gather_on_smooth_content():
    """On smooth (conv-feature-like) volumes the multi-pass filter must track
    the single trilinear gather closely; on white noise they legitimately
    differ (different resampling filters — module docstring)."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(3)
    b, s, c = 4, 16, 8
    raw = rng.normal(size=(b, s, s, s, c))
    smooth = np.stack([gaussian_filter(raw[i], sigma=(1.2, 1.2, 1.2, 0))
                       for i in range(b)]).astype(np.float32)
    vol = jnp.asarray(smooth)
    view, inv = _hologan_inv(rng, b=b)
    got = np.asarray(SW.warp_by_inverse(vol, inv, pad=4))
    zz, yy, xx = jnp.meshgrid(jnp.arange(s), jnp.arange(s), jnp.arange(s),
                              indexing="ij")
    grid = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1),
                      jnp.ones(s ** 3)], 0).astype(jnp.float32)
    coords = jnp.moveaxis((inv @ grid[None])[:, :3, :], 1, 2)
    ref = np.asarray(trilinear_resample(vol, coords)).reshape(b, s, s, s, c)
    rel = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
    assert rel < 0.2, rel


def test_shear_warp_differentiable_wrt_volume_and_view():
    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 2)), jnp.float32)
    view = jnp.asarray(np.tile([0.7, 1.2, 1.0, 0.1, 0.0, 0.0], (2, 1)),
                       jnp.float32)

    def f(v, vw):
        return jnp.sum(rigid_transform_volume(v, vw, resample="shear"))

    dv, dvw = jax.grad(f, argnums=(0, 1))(vol, view)
    assert np.isfinite(np.asarray(dv)).all()
    assert np.isfinite(np.asarray(dvw)).all()
    # unlike the custom-VJP kernel, the shear path differentiates through
    # the view parameters too
    assert float(jnp.max(jnp.abs(dvw))) > 0.0
