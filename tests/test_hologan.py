"""HoloGAN stack tests: trilinear resample vs scipy map_coordinates golden,
rigid transform identity, G/D shapes (SURVEY §4, §7.3 item 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_gan_zoo_tpu.ops.grid_sample import (bilinear_sample,
                                                   trilinear_resample)


def test_trilinear_matches_map_coordinates():
    from scipy.ndimage import map_coordinates
    rng = np.random.default_rng(0)
    vox = rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32)
    pts = rng.uniform(0.5, 4.0, size=(2, 50, 3)).astype(np.float32)
    out = np.asarray(trilinear_resample(jnp.asarray(vox), jnp.asarray(pts)))
    for b in range(2):
        for c in range(3):
            ref = map_coordinates(
                vox[b, :, :, :, c],
                [pts[b, :, 2], pts[b, :, 1], pts[b, :, 0]],  # (z, y, x)
                order=1, mode="nearest")
            np.testing.assert_allclose(out[b, :, c], ref, rtol=1e-4,
                                       atol=1e-5)


def test_trilinear_integer_coords_identity():
    rng = np.random.default_rng(1)
    vox = rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32)
    zz, yy, xx = np.meshgrid(range(4), range(4), range(4), indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)[None].astype(
        np.float32)
    out = np.asarray(trilinear_resample(jnp.asarray(vox), jnp.asarray(pts)))
    np.testing.assert_allclose(out[0].reshape(4, 4, 4, 2), vox[0], atol=1e-6)


def test_trilinear_differentiable():
    vox = jnp.ones((1, 4, 4, 4, 1))
    pts = jnp.full((1, 8, 3), 1.5)

    def f(v):
        return jnp.sum(trilinear_resample(v, pts))

    g = jax.grad(f)(vox)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(g)) == pytest.approx(8.0, rel=1e-5)


def test_bilinear_sample_matches_identity_grid():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8),
                         indexing="ij")
    grid = np.stack([xs, ys], -1)[None].astype(np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_rigid_transform_identity_view():
    from lightning_gan_zoo_tpu.models.hologan import rigid_transform_volume
    rng = np.random.default_rng(3)
    vox = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 4)), jnp.float32)
    # zero azimuth/elevation/translation, unit scale → identity warp
    view = jnp.asarray(np.tile([0.0, 0, 1, 0, 0, 0], (2, 1)), jnp.float32)
    out = rigid_transform_volume(vox, view)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vox), atol=1e-3)


def test_rigid_transform_rotation_permutes_energy():
    """A 90° azimuth rotation must preserve total feature energy away from
    borders (content rotates, doesn't vanish)."""
    from lightning_gan_zoo_tpu.models.hologan import rigid_transform_volume
    vox = np.zeros((1, 16, 16, 16, 1), np.float32)
    vox[0, 6:10, 6:10, 6:10, 0] = 1.0  # centred cube, rotation-invariant
    view = jnp.asarray([[np.pi / 2, 0, 1, 0, 0, 0]], jnp.float32)
    out = np.asarray(rigid_transform_volume(jnp.asarray(vox), view))
    assert abs(out.sum() - vox.sum()) / vox.sum() < 0.05


def test_hologan_generator_and_discriminator():
    from lightning_gan_zoo_tpu.config.node import Config
    from lightning_gan_zoo_tpu.models.hologan import Discriminator, Generator
    va = Config(dict(elevation_low=70, elevation_high=110, azimuth_low=220,
                     azimuth_high=320, scale_low=1, scale_high=1,
                     transX_low=0, transX_high=0, transY_low=0,
                     transY_high=0, transZ_low=0, transZ_high=0))
    g = Generator(in_planes=4, out_planes=3, z_planes=8, view_args=va,
                  img_size=64)
    z = jnp.zeros((2, 8))
    gv = g.init({"params": jax.random.PRNGKey(0),
                 "view": jax.random.PRNGKey(1)}, z, train=False)
    img = g.apply(gv, z, train=False, rngs={"view": jax.random.PRNGKey(2)})
    assert img.shape == (2, 64, 64, 3)

    d = Discriminator(in_planes=3, out_planes=4, z_planes=8)
    dv = d.init(jax.random.PRNGKey(3), img, train=False)
    (logit, z_pred), _ = d.apply(dv, img, train=False,
                                 mutable=["spectral"])
    assert logit.shape == (2,)
    assert z_pred.shape == (2, 8)
    assert np.all(np.abs(np.asarray(z_pred)) <= 1.0)


def test_rigid_transform_project_equals_unfused():
    """Fused transform+flip+collapse (grid reorder) must equal the unfused
    rigid_transform_volume -> flip -> moveaxis -> reshape pipeline."""
    from lightning_gan_zoo_tpu.models.hologan import (
        rigid_transform_project, rigid_transform_volume, sample_view)

    rng = np.random.default_rng(3)
    b, d, c = 3, 8, 6
    vox = jnp.asarray(rng.normal(size=(b, d, d, d, c)).astype(np.float32))
    view = jnp.asarray(rng.normal(size=(b, 6)).astype(np.float32) * 0.3)
    vol = rigid_transform_volume(vox, view, d, d, resample="gather")
    want = jnp.moveaxis(vol[:, ::-1], 1, 3).reshape(b, d, d, d * c)
    got = rigid_transform_project(vox, view, d, d, resample="gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
