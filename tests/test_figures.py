"""Figure framework tests: FID-gated drawing, grid assembly, rasterizer,
and ANIGAN figures end-to-end on synthetic shape analyses."""
import numpy as np
import jax
import jax.numpy as jnp
from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.config import compose
from lightning_gan_zoo_tpu.config.registry import instantiate
from lightning_gan_zoo_tpu.figures.image_io import make_grid, unnormalise
from lightning_gan_zoo_tpu.figures.types import FigureContext, SampleGrid


def test_make_grid_layout():
    imgs = np.zeros((4, 8, 8, 3), np.float32)
    imgs[0] = 1.0
    grid = make_grid(imgs, ncol=2, padding=1)
    assert grid.shape == (19, 19, 3)
    assert grid[1, 1, 0] == 1.0          # first tile top-left
    assert grid[1, 10, 0] == 0.0         # second tile


def test_unnormalise_clamps():
    x = np.array([[-3.0, 0.0, 3.0]])
    out = unnormalise(x, 0.5, 0.5)
    assert out.min() >= 0.0 and out.max() <= 1.0


def _dcgan_ctx(tmp_path):
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                             "train.img_size=16", "train.features_gen=8",
                             "train.features_disc=8", "model.noise_dim=16",
                             "precision=32"])
    task = instantiate(cfg.model.lm, cfg, str(tmp_path))
    g_vars, _ = task.init(jax.random.PRNGKey(0))
    return cfg, FigureContext(
        task=task, g_params=dict(g_vars)["params"],
        g_state={k: v for k, v in g_vars.items() if k != "params"},
        cfg=cfg, epoch=0, rng=jax.random.PRNGKey(1))


def test_fid_gating(tmp_path):
    cfg, ctx = _dcgan_ctx(tmp_path)
    fig = SampleGrid(cfg.figure_details, str(tmp_path), monitor="fid",
                     ncol=2)
    out = tmp_path / "figures" / "SampleGrid.png"
    fig.on_validation_end(ctx, {"fid": 10.0})
    assert out.exists()
    mtime = out.stat().st_mtime_ns
    fig.on_validation_end(ctx, {"fid": 20.0})   # worse → no redraw
    assert out.stat().st_mtime_ns == mtime
    fig.on_validation_end(ctx, {"fid": 5.0})    # better → redraw
    assert out.stat().st_mtime_ns > mtime


def test_save_all_epoch_subdirs(tmp_path):
    cfg, ctx = _dcgan_ctx(tmp_path)
    details = cfg.figure_details.copy()
    details["save_all"] = True
    fig = SampleGrid(details, str(tmp_path), ncol=2)
    fig.on_validation_end(ctx, {})
    assert (tmp_path / "figures" / "epoch_0" / "SampleGrid.png").exists()


def test_rasterizer_renders_triangle():
    from lightning_gan_zoo_tpu.nerf.cameras import look_at_view_transform
    from lightning_gan_zoo_tpu.nerf.rasterize import render_mesh_lambert
    verts = jnp.asarray([[[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0],
                          [0.0, 0.6, 0.0]]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    # oblique view → Lambert shade < 1 so the face is distinguishable from
    # the white background
    cams = look_at_view_transform(2.0, 30.0, 40.0)
    img = np.asarray(render_mesh_lambert(verts, faces, cams, 32))
    assert img.shape == (1, 32, 32, 3)
    corner = img[0, 0, 0, 0]
    assert corner == 1.0                 # background white
    covered = img[0, :, :, 0] < 0.999
    assert covered.sum() > 20            # some lit, shaded pixels
    assert img[0, :, :, 0].min() > 0.2   # ambient floor


def test_rasterizer_per_instance_colors():
    """colors=(B,3) tints the Lambert shade channel-wise over the white
    background; colors=None stays bit-identical to the historical
    grayscale output (tools/make_shapes_dataset.py depends on both)."""
    from lightning_gan_zoo_tpu.nerf.cameras import look_at_view_transform
    from lightning_gan_zoo_tpu.nerf.rasterize import render_mesh_lambert
    verts = jnp.asarray([[[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0],
                          [0.0, 0.6, 0.0]]] * 2)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    cams = look_at_view_transform(2.0, jnp.asarray([30.0, 30.0]),
                                  jnp.asarray([40.0, 40.0]))
    plain = np.asarray(render_mesh_lambert(verts, faces, cams, 32))
    tinted = np.asarray(render_mesh_lambert(
        verts, faces, cams, 32,
        colors=jnp.asarray([[1.0, 1.0, 1.0], [1.0, 0.5, 0.0]])))
    # white albedo == legacy grayscale path, bit for bit
    np.testing.assert_array_equal(tinted[0], plain[0])
    fg = tinted[1, :, :, 0] < 0.999
    assert fg.sum() > 20
    # tinted foreground keeps the channel ratio, background stays white
    np.testing.assert_allclose(tinted[1, fg, 1], tinted[1, fg, 0] * 0.5,
                               rtol=1e-5)
    np.testing.assert_array_equal(tinted[1, fg, 2], 0.0)
    assert tinted[1, 0, 0].tolist() == [1.0, 1.0, 1.0]


def test_phong_rasterizer_smooth_shading_and_specular():
    """render_mesh_phong: an icosphere-ish faceted ball must shade SMOOTHLY
    (interpolated vertex normals → many distinct shade levels across a
    face, unlike flat Lambert's one shade per face) and show a specular
    highlight (max shade above the ambient+diffuse ceiling)."""
    from lightning_gan_zoo_tpu.nerf.cameras import look_at_view_transform
    from lightning_gan_zoo_tpu.nerf.rasterize import (render_mesh_lambert,
                                                      render_mesh_phong)

    # UV sphere (coarse: 8x8) centred at origin, radius 0.7
    nu, nv = 8, 8
    th = np.linspace(0, np.pi, nv + 1)
    ph = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs, fs = [], []
    for t in th:
        for p in ph:
            vs.append([np.sin(t) * np.cos(p), np.cos(t),
                       np.sin(t) * np.sin(p)])
    for i in range(nv):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + j
            d = (i + 1) * nu + (j + 1) % nu
            fs += [[a, b, c], [b, d, c]]
    verts = jnp.asarray(np.asarray(vs, np.float32)[None] * 0.7)
    faces = jnp.asarray(np.asarray(fs, np.int32))
    cams = look_at_view_transform(2.0, 10.0, 20.0)

    phong = np.asarray(render_mesh_phong(verts, faces, cams, 48))
    flat = np.asarray(render_mesh_lambert(verts, faces, cams, 48))
    assert phong.shape == (1, 48, 48, 3)
    cov_p = phong[0, :, :, 0] < 0.999
    cov_f = flat[0, :, :, 0] < 0.999
    assert cov_p.sum() > 100 and cov_f.sum() > 100
    # smooth shading: far more distinct levels than faces-facing-ways
    lv_p = len(np.unique(np.round(phong[0, cov_p, 0], 3)))
    lv_f = len(np.unique(np.round(flat[0, cov_f, 0], 3)))
    assert lv_p > 2 * lv_f, (lv_p, lv_f)
    # specular highlight: the lit pole exceeds ambient+diffuse alone
    assert phong[0, cov_p, 0].max() > 0.5 + 0.3 + 0.05
    # background stays white
    assert phong[0, 0, 0, 0] == 1.0


def test_anigan_figures_draw(tmp_path):
    """FullShapeAnalysis + AniganTurntable end-to-end with synthetic npz
    shape analyses on disk."""
    from PIL import Image
    rng = np.random.default_rng(0)
    img_root = tmp_path / "imgs" / "cls"
    img_root.mkdir(parents=True)
    ana_root = tmp_path / "analysis"
    ana_root.mkdir()
    for i in range(4):
        arr = rng.uniform(0, 255, (24, 24, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_root / f"im{i}.png")
        np.savez(ana_root / f"im{i}.npz",
                 cam_pred=np.array([1.0, 0, 0, 1, 0, 0, 0], np.float32),
                 mean_shape=rng.normal(size=(40, 3)).astype(np.float32),
                 verts=rng.normal(size=(40, 3)).astype(np.float32),
                 kp_verts=rng.normal(size=(15, 3)).astype(np.float32),
                 mask_pred=rng.uniform(size=(24, 24)).astype(np.float32),
                 faces=rng.integers(0, 40, size=(30, 3)).astype(np.float32))

    cfg = compose(CONF_DIR, [
        "+expt=anigan", "machine=local", "model.noise_dim=16",
        "nerf.siren_dim_hidden=32", "nerf.siren_num_layers=2",
        "nerf.n_pts_per_ray=4", "nerf.n_pts_per_ray_fine=4",
        "train.features_disc=8", "train.img_size=16", "precision=32",
        "resolution_annealing.resolutions=[8,16,16]",
        "variable_batch_size.batch_sizes=[2,2,2]",
        f"filepaths.birds_root={tmp_path}/imgs",
        f"filepaths.birds_analysis_root={ana_root}",
        "dataset.train.root=" + str(tmp_path / "imgs"),
        "dataset.val.root=" + str(tmp_path / "imgs")])
    task = instantiate(cfg.model.lm, cfg, str(tmp_path))
    g_vars, _ = task.init(jax.random.PRNGKey(0))
    ctx = FigureContext(
        task=task, g_params=dict(g_vars)["params"],
        g_state={k: v for k, v in g_vars.items() if k != "params"},
        cfg=cfg, epoch=0, rng=jax.random.PRNGKey(1))

    from lightning_gan_zoo_tpu.figures.anigan_figures import (
        AniganTurntable, FullShapeAnalysis)
    fsa = FullShapeAnalysis(cfg.figure_details, str(tmp_path),
                            val_dataset=cfg.dataset.val, n_objs=2)
    fsa.draw_and_save(ctx)
    assert (tmp_path / "figures" / "epoch_0"
            / "FullShapeAnalysis.png").exists()  # anigan sets save_all

    tt = AniganTurntable(cfg.figure_details, str(tmp_path),
                         val_dataset=cfg.dataset.val, n_frames=3, n_objs=2)
    tt.draw_and_save(ctx)
    assert (tmp_path / "figures" / "epoch_0"
            / "AniganTurntable.gif").exists()


def _hologan_ctx(tmp_path):
    from lightning_gan_zoo_tpu.parallel.family_runs import build_family
    cfg, task = build_family(CONF_DIR, "hologan", batch=4)
    g_vars, _ = task.init(jax.random.PRNGKey(0))
    return cfg, FigureContext(
        task=task, g_params=dict(g_vars)["params"],
        g_state={k: v for k, v in g_vars.items() if k != "params"},
        cfg=cfg, epoch=0, rng=jax.random.PRNGKey(1))


def _pigan_ctx(tmp_path):
    from lightning_gan_zoo_tpu.parallel.family_runs import build_family
    cfg, task = build_family(CONF_DIR, "pigan", batch=4)
    g_vars, _ = task.init(jax.random.PRNGKey(0))
    return cfg, FigureContext(
        task=task, g_params=dict(g_vars)["params"],
        g_state={k: v for k, v in g_vars.items() if k != "params"},
        cfg=cfg, epoch=0, rng=jax.random.PRNGKey(1))


def _gif_frames(path):
    from PIL import Image
    with Image.open(path) as im:
        return im.n_frames


def test_interpolation_figure(tmp_path):
    """Spherical z-lerp GIF (reference types.py:241-264): n_frames forwards
    + n_frames backwards, values in [0,1]."""
    from lightning_gan_zoo_tpu.figures.types import Interpolation
    cfg, ctx = _dcgan_ctx(tmp_path)
    fig = Interpolation(cfg.figure_details, str(tmp_path), n_frames=3)
    frames = fig.draw(ctx)
    assert len(frames) == 6
    for f in frames:
        assert f.min() >= 0.0 and f.max() <= 1.0
    fig.draw_and_save(ctx)
    out = fig._out_path(ctx)
    # PIL merges the duplicated palindrome middle frame when writing
    assert out.exists() and _gif_frames(out) in (5, 6)


def test_interpolation3d_figure(tmp_path):
    """Joint z+pose lerp for HoloGAN (reference types.py:266-293)."""
    from lightning_gan_zoo_tpu.figures.types import Interpolation3d
    cfg, ctx = _hologan_ctx(tmp_path)
    fig = Interpolation3d(cfg.figure_details, str(tmp_path), n_frames=2)
    frames = fig.draw(ctx)
    assert len(frames) == 4
    for f in frames:
        assert f.min() >= 0.0 and f.max() <= 1.0
    fig.draw_and_save(ctx)
    assert fig._out_path(ctx).exists()


def test_azimuth_and_elevation_step_figures(tmp_path):
    """Pose-sweep grids (reference types.py:182-239): n_objs rows ×
    n_steps azimuth/elevation columns; poses must actually change the
    rendered image."""
    from lightning_gan_zoo_tpu.figures.types import (AzimuthStep,
                                                     ElevationStep)
    cfg, ctx = _hologan_ctx(tmp_path)
    for cls, fname in ((AzimuthStep, "AzimuthStep.png"),
                       (ElevationStep, "ElevationStep.png")):
        fig = cls(cfg.figure_details, str(tmp_path), n_steps=2, n_objs=2)
        grid = fig.draw(ctx)
        assert grid.ndim == 3 and grid.shape[-1] == 3
        assert grid.min() >= 0.0 and grid.max() <= 1.0
        fig.draw_and_save(ctx)
        assert fig._out_path(ctx).exists()


def test_azimuth_step_pigan(tmp_path):
    """The pose-sweep figures also work for π-GAN (view_in → cameras path,
    reference pigan.py:42-53)."""
    from lightning_gan_zoo_tpu.figures.types import AzimuthStep
    cfg, ctx = _pigan_ctx(tmp_path)
    fig = AzimuthStep(cfg.figure_details, str(tmp_path), n_steps=2, n_objs=2)
    grid = fig.draw(ctx)
    assert grid.min() >= 0.0 and grid.max() <= 1.0
    fig.draw_and_save(ctx)
    assert fig._out_path(ctx).exists()  # pigan config sets save_all


def test_azimuth_and_elevation_gif_figures(tmp_path):
    """Orbit GIFs (reference types.py:295-359): frame count = 2·n_frames
    (forward + reverse), distinct poses give distinct frames."""
    from lightning_gan_zoo_tpu.figures.types import AzimuthGif, ElevationGif
    cfg, ctx = _hologan_ctx(tmp_path)

    fig = AzimuthGif(cfg.figure_details, str(tmp_path), ncol=2, n_frames=2)
    frames = fig.draw(ctx)
    assert len(frames) == 4
    assert np.abs(frames[0] - frames[1]).max() > 1e-4  # azimuth changed
    fig.draw_and_save(ctx)
    out = fig._out_path(ctx)
    assert out.exists() and _gif_frames(out) in (3, 4)

    fig = ElevationGif(cfg.figure_details, str(tmp_path), num_objs=4,
                       n_frames=2)
    frames = fig.draw(ctx)
    assert len(frames) == 4
    for f in frames:
        assert f.min() >= 0.0 and f.max() <= 1.0
    fig.draw_and_save(ctx)
    out = fig._out_path(ctx)
    assert out.exists() and _gif_frames(out) in (3, 4)
