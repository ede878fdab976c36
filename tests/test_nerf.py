"""NeRF stack tests: sample_pdf vs numpy reference, EA raymarcher invariant,
camera geometry, TPS exactness, π-GAN/ANIGAN supersteps + progressive growth
(SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.config import compose
from lightning_gan_zoo_tpu.config.registry import instantiate
from lightning_gan_zoo_tpu.nerf import cameras as cam
from lightning_gan_zoo_tpu.nerf.renderer import ea_raymarch, shifted_cumprod
from lightning_gan_zoo_tpu.nerf.sampling import (sample_full_xys,
                                                 sample_images_at_xys,
                                                 sample_pdf)
from lightning_gan_zoo_tpu.runtime.state import create_train_state
from lightning_gan_zoo_tpu.runtime.steps import build_superstep


# ---------------------------------------------------------------- sampling

def _np_sample_pdf_det(bins, weights, n, eps=1e-5):
    """Direct numpy port of the reference sample_pdf det path
    (core/nerf/utils.py:5-67)."""
    weights = weights + eps
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    u = np.broadcast_to(np.linspace(0, 1, n), cdf.shape[:-1] + (n,))
    inds = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                     for i in range(cdf.shape[0])])
    below = np.clip(inds - 1, 0, cdf.shape[-1] - 1)
    above = np.clip(inds, 0, cdf.shape[-1] - 1)
    cdf_g0 = np.take_along_axis(cdf, below, -1)
    cdf_g1 = np.take_along_axis(cdf, above, -1)
    bins_g0 = np.take_along_axis(bins, below, -1)
    bins_g1 = np.take_along_axis(bins, above, -1)
    denom = cdf_g1 - cdf_g0
    denom = np.where(denom < eps, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def test_sample_pdf_matches_numpy_reference():
    rng = np.random.default_rng(0)
    bins = np.sort(rng.uniform(0, 1, (4, 9)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (4, 8)).astype(np.float32)
    got = np.asarray(sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                                jnp.asarray(weights), 6, det=True))
    expect = _np_sample_pdf_det(bins, weights, 6)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_sample_pdf_random_within_support():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    weights = jnp.ones((4, 8))
    s = sample_pdf(jax.random.PRNGKey(1), bins, weights, 16, det=False)
    assert float(jnp.min(s)) >= 0.0 and float(jnp.max(s)) <= 1.0


# ---------------------------------------------------------------- raymarcher

def test_ea_raymarch_weight_invariant():
    """weights must form a sub-probability distribution and opacity must be
    1 − ∏(1−d) (reference raymarcher.py:38-42,58)."""
    rng = np.random.default_rng(1)
    dens = jnp.asarray(rng.uniform(0, 1, (2, 5, 8, 1)), jnp.float32)
    feats = jnp.asarray(rng.uniform(0, 1, (2, 5, 8, 3)), jnp.float32)
    rgba, weights = ea_raymarch(dens, feats)
    wsum = np.asarray(jnp.sum(weights, -1))
    assert (wsum <= 1.0 + 1e-4).all() and (wsum >= 0).all()
    opac = np.asarray(rgba[..., 3])
    expect_opac = 1 - np.prod(1 - np.asarray(dens[..., 0]), -1)
    np.testing.assert_allclose(opac, expect_opac, atol=1e-5)


def test_ea_raymarch_white_bg():
    dens = jnp.zeros((1, 1, 4, 1))
    feats = jnp.zeros((1, 1, 4, 3))
    rgba, _ = ea_raymarch(dens, feats, True)
    np.testing.assert_allclose(np.asarray(rgba[..., :3]), 1.0, atol=1e-5)


def test_shifted_cumprod():
    x = jnp.asarray([[0.5, 0.5, 0.5]])
    out = np.asarray(shifted_cumprod(x))
    np.testing.assert_allclose(out, [[1.0, 0.5, 0.25]], atol=1e-6)


# ---------------------------------------------------------------- cameras

def test_lookat_camera_centers_scene():
    """World origin must project to view z == dist for any azimuth."""
    cams = cam.look_at_view_transform(2.0, [0.0, 0.0], [0.0, 90.0])
    origin = jnp.zeros((2, 1, 3))
    view = jnp.einsum("bnj,bjk->bnk", origin, cams.R) + cams.T[:, None]
    np.testing.assert_allclose(np.asarray(view[..., 2]), 2.0, atol=1e-5)


def test_rays_are_parallel_and_offset():
    cams = cam.look_at_view_transform(1.0, 0.0, 33.0)
    xy = jnp.asarray([[[0.0, 0.0], [0.5, -0.5]]])
    origins, dirs = cam.world_rays_from_ndc(cams, xy)
    d = np.asarray(dirs)
    np.testing.assert_allclose(d[0, 0], d[0, 1], atol=1e-5)  # orthographic
    assert not np.allclose(np.asarray(origins)[0, 0],
                           np.asarray(origins)[0, 1])


def test_sample_images_at_xys_matches_torch_grid_sample():
    """Parity with the reference's torch grid_sample path
    (core/nerf/utils.py:105-119, incl. the sign flip at :111)."""
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    xys = np.asarray(sample_full_xys(2, 8))
    out = np.asarray(sample_images_at_xys(jnp.asarray(img),
                                          jnp.asarray(xys)))
    grid = torch.from_numpy(-xys.reshape(2, -1, 1, 2))
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2), grid,
                        align_corners=True, mode="bilinear")
    ref = ref.permute(0, 2, 3, 1).reshape(2, 8, 8, 3).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_convert_cam_pred_identity_quat():
    cam_pred = jnp.asarray([[2.0, 0.1, -0.2, 1.0, 0.0, 0.0, 0.0]])
    cams, scale = cam.convert_cam_pred(cam_pred)
    assert float(scale[0]) == 2.0
    np.testing.assert_allclose(np.asarray(cams.T),
                               [[-0.1, 0.2, 1.0]], atol=1e-6)
    flip = np.diag([-1.0, -1.0, 1.0])
    np.testing.assert_allclose(np.asarray(cams.R[0]), flip, atol=1e-6)


# ---------------------------------------------------------------- TPS

def test_tps_exact_interpolation():
    from lightning_gan_zoo_tpu.anigan import tps
    rng = np.random.default_rng(0)
    ctrl = jnp.asarray(rng.normal(size=(2, 20, 3)), jnp.float32)
    targ = jnp.asarray(rng.normal(size=(2, 20, 3)), jnp.float32)
    w = tps.find_coefficients(ctrl, targ, 0.0)
    out = tps.transform(ctrl, ctrl, w)
    assert float(jnp.max(jnp.abs(out - targ))) < 1e-4


def test_tps_affine_reproduction():
    """A pure affine map must be reproduced exactly with (near-)zero
    nonrigid weights."""
    from lightning_gan_zoo_tpu.anigan import tps
    rng = np.random.default_rng(3)
    ctrl = jnp.asarray(rng.normal(size=(1, 12, 3)), jnp.float32)
    a = jnp.asarray([[0.5, 0.1, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 1.0]])
    b = jnp.asarray([1.0, -2.0, 0.5])
    targ = ctrl @ a.T + b
    w = tps.find_coefficients(ctrl, targ, 0.0)
    query = jnp.asarray(rng.normal(size=(1, 30, 3)), jnp.float32)
    out = tps.transform(query, ctrl, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(query @ a.T + b),
                               atol=1e-3)


# ---------------------------------------------------------------- π-GAN task

PIGAN_TINY = ["machine=local", "dataset=synthetic", "model.noise_dim=16",
              "nerf.siren_dim_hidden=32", "nerf.siren_num_layers=2",
              "nerf.n_pts_per_ray=4", "nerf.n_pts_per_ray_fine=4",
              "train.features_disc=8", "train.img_size=64",
              "resolution_annealing.resolutions=[8,16,32]",
              "variable_batch_size.batch_sizes=[2,2,2]", "precision=32"]


def _run_task(task, batch, n=1):
    d_tx, g_tx = task.configure_optimizers(4)
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    state = create_train_state(g_vars, d_vars, g_tx, d_tx,
                               extra=task.initial_extra())
    step = jax.jit(build_superstep(task, g_tx, d_tx, 1, 1))
    for i in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
    return state, metrics


def _img_batch(rng, b=2):
    return {"image": jnp.asarray(rng.normal(size=(2, b, 64, 64, 3)) * 0.2,
                                 jnp.float32),
            "label": jnp.zeros((2, b), jnp.int32)}


def test_pigan_superstep_and_growth():
    cfg = compose(CONF_DIR, ["+expt=pigan", *PIGAN_TINY])
    task = instantiate(cfg.model.lm, cfg, "/tmp/lgzt_pigan")
    rng = np.random.default_rng(0)
    batch = _img_batch(rng)
    state, metrics = _run_task(task, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert int(state.extra["iterations"]) == 2
    # grow: resolution 8 → 16, alpha resets to 1, same params keep working
    task.increase_resolution(16)
    state = state.replace(extra=task.reset_alpha(state.extra))
    d_tx, g_tx = task.configure_optimizers(4)
    step16 = jax.jit(build_superstep(task, g_tx, d_tx, 1, 1))
    state2, m2 = step16(state, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(m2["d_loss"]))
    assert float(state2.extra["alpha"]) == pytest.approx(1 - 2 / 10000,
                                                         rel=1e-3)


def test_pigan_generate_rgba():
    cfg = compose(CONF_DIR, ["+expt=pigan", *PIGAN_TINY])
    task = instantiate(cfg.model.lm, cfg, "/tmp/lgzt_pigan")
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    img = task.generate(dict(g_vars)["params"],
                        {k: v for k, v in g_vars.items() if k != "params"},
                        task.sample_z(jax.random.PRNGKey(1), 2),
                        rng=jax.random.PRNGKey(2), sample_res=8)
    assert img.shape == (2, 8, 8, 4)
    arr = np.asarray(img)
    assert (arr >= 0).all() and (arr <= 1).all()


@pytest.mark.parametrize("deformer", ["displacement", "tps"])
def test_anigan_superstep(deformer):
    overrides = ["+expt=anigan", *PIGAN_TINY]
    if deformer != "tps":
        overrides.append(f"deformer={deformer}")
    cfg = compose(CONF_DIR, overrides)
    task = instantiate(cfg.model.lm, cfg, "/tmp/lgzt_anigan")
    rng = np.random.default_rng(0)
    b = 2
    sa = {"cam_pred": jnp.asarray(
        np.concatenate([np.ones((b, 1)), np.zeros((b, 2)),
                        np.tile([1, 0, 0, 0], (b, 1))], 1), jnp.float32),
        "mean_shape": jnp.asarray(rng.normal(size=(b, 40, 3)), jnp.float32),
        "verts": jnp.asarray(rng.normal(size=(b, 40, 3)), jnp.float32),
        "kp_verts": jnp.asarray(rng.normal(size=(b, 15, 3)), jnp.float32),
        "mask_pred": jnp.asarray(rng.uniform(size=(b, 64, 64)), jnp.float32)}
    batch = _img_batch(rng, b)
    batch["shape_analysis"] = {k: jnp.broadcast_to(v, (2,) + v.shape)
                               for k, v in sa.items()}
    state, metrics = _run_task(task, batch)
    assert np.isfinite(float(metrics["g_loss"]))
    assert float(metrics["silhouette"]) >= 0.0


def test_siren_bf16_policy_stays_accurate():
    """The first SIREN layer (w0=30) and all sine args run in f32 even under
    the bf16 policy — outputs must track the full-f32 net closely."""
    from lightning_gan_zoo_tpu.nerf.siren import SirenNet
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 3)), jnp.float32)
    net32 = SirenNet(dim_hidden=64, dim_out=4, num_layers=3,
                     dtype=jnp.float32)
    v = net32.init(jax.random.PRNGKey(0), x)
    net16 = SirenNet(dim_hidden=64, dim_out=4, num_layers=3,
                     dtype=jnp.bfloat16)
    out32 = np.asarray(net32.apply(v, x))
    out16 = np.asarray(net16.apply(v, x)).astype(np.float32)
    assert np.mean(np.abs(out32 - out16)) < 0.05


def test_progressive_d_alpha_blend_continuity():
    """Progressive D: alpha=0 must equal the pure new-resolution path, and
    the output must vary continuously in alpha (the fade-in contract,
    reference pigan.py:189-191)."""
    from lightning_gan_zoo_tpu.models.pigan import Discriminator
    d = Discriminator(img_size=32, init_chan=8, max_chan=32,
                      init_resolution=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x, alpha=0.0, current_res=16)
    o0 = d.apply(v, x, alpha=0.0, current_res=16)
    o_half = d.apply(v, x, alpha=0.5, current_res=16)
    o1 = d.apply(v, x, alpha=1.0, current_res=16)
    # alpha actually modulates the computation
    assert not np.allclose(np.asarray(o0), np.asarray(o1))
    # continuity: midpoint lies between-ish (loose sanity, not exact since
    # the blend feeds a nonlinear tower)
    assert np.isfinite(np.asarray(o_half)).all()


def test_progressive_d_all_entry_points_share_tail_params():
    """Entering at any resolution must reuse the same deep-block params
    (growth never reshapes the optimizer state)."""
    from lightning_gan_zoo_tpu.models.pigan import Discriminator
    d = Discriminator(img_size=32, init_chan=8, max_chan=32,
                      init_resolution=8)
    x8 = jnp.zeros((1, 8, 8, 3))
    v = d.init(jax.random.PRNGKey(0), x8, alpha=0.0, current_res=8)
    for res in (8, 16, 32):
        x = jnp.zeros((1, res, res, 3))
        out = d.apply(v, x, alpha=0.0, current_res=res)
        assert out.shape == (1,)


def test_fast_sin_accuracy():
    from lightning_gan_zoo_tpu.ops.fast_math import fast_sin
    xs = jnp.asarray(np.random.default_rng(9).uniform(-500, 500, 200000),
                     jnp.float32)
    err = float(jnp.max(jnp.abs(fast_sin(xs)
                                - jnp.sin(xs.astype(jnp.float64)))))
    assert err < 1e-3  # an order of magnitude below bf16 resolution


def test_sort_last_matches_jnp_sort_values_and_grads():
    from lightning_gan_zoo_tpu.ops.sorting import sort_last
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, 5, 12)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(sort_last(x)),
                                  np.asarray(jnp.sort(x, axis=-1)))
    w = jnp.asarray(rng.normal(size=(3, 5, 12)), jnp.float32)
    g1 = jax.grad(lambda a: jnp.sum(sort_last(a) * w))(x)
    g2 = jax.grad(lambda a: jnp.sum(jnp.sort(a, axis=-1) * w))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_ea_raymarch_custom_vjp_matches_autodiff():
    """The closed-form backward must equal autodiff of the plain
    implementation for both outputs, both inputs, both white_bg modes."""
    from lightning_gan_zoo_tpu.nerf.renderer import (_ea_raymarch_impl,
                                                     ea_raymarch)
    rng = np.random.default_rng(12)
    d = jnp.asarray(rng.uniform(0.01, 0.99, (2, 7, 9, 1)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(2, 7, 9, 3)), jnp.float32)
    go = jnp.asarray(rng.normal(size=(2, 7, 4)), jnp.float32)
    gw = jnp.asarray(rng.normal(size=(2, 7, 9)), jnp.float32)
    for wb in (False, True):
        def loss_custom(dd, ff):
            out, w = ea_raymarch(dd, ff, wb)
            return jnp.sum(out * go) + jnp.sum(w * gw)

        def loss_ref(dd, ff):
            out, w = _ea_raymarch_impl(dd, ff, wb, 1e-10)
            return jnp.sum(out * go) + jnp.sum(w * gw)

        v1 = float(loss_custom(d, f))
        v2 = float(loss_ref(d, f))
        assert v1 == pytest.approx(v2, rel=1e-5)
        gd1, gf1 = jax.grad(loss_custom, argnums=(0, 1))(d, f)
        gd2, gf2 = jax.grad(loss_ref, argnums=(0, 1))(d, f)
        np.testing.assert_allclose(np.asarray(gd1), np.asarray(gd2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2),
                                   rtol=1e-4, atol=1e-5)


def test_ea_raymarch_vjp_finite_at_saturated_density():
    """Densities of exactly 1.0 (bf16 sigmoid saturation) make c−d == 0 in
    f32; the closed-form backward must stay finite (the suffix sum is exactly
    0 there, so the 0/0 resolves to 0) and match autodiff of the plain
    implementation, which has no division at all."""
    from lightning_gan_zoo_tpu.nerf.renderer import (_ea_raymarch_impl,
                                                     ea_raymarch)
    rng = np.random.default_rng(13)
    d = rng.uniform(0.01, 0.99, (2, 5, 8, 1)).astype(np.float32)
    d[0, 0, 2, 0] = 1.0   # interior saturation
    d[1, 3, 0, 0] = 1.0   # first-sample saturation
    d[0, 4, 7, 0] = 1.0   # last-sample saturation
    d = jnp.asarray(d)
    f = jnp.asarray(rng.normal(size=(2, 5, 8, 3)), jnp.float32)
    go = jnp.asarray(rng.normal(size=(2, 5, 4)), jnp.float32)
    gw = jnp.asarray(rng.normal(size=(2, 5, 8)), jnp.float32)
    for wb in (False, True):
        def loss_custom(dd, ff):
            out, w = ea_raymarch(dd, ff, wb)
            return jnp.sum(out * go) + jnp.sum(w * gw)

        def loss_ref(dd, ff):
            out, w = _ea_raymarch_impl(dd, ff, wb, 1e-10)
            return jnp.sum(out * go) + jnp.sum(w * gw)

        gd1, gf1 = jax.grad(loss_custom, argnums=(0, 1))(d, f)
        gd2, gf2 = jax.grad(loss_ref, argnums=(0, 1))(d, f)
        assert bool(jnp.all(jnp.isfinite(gd1))), "NaN in density grads"
        np.testing.assert_allclose(np.asarray(gd1), np.asarray(gd2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2),
                                   rtol=1e-4, atol=1e-5)


def test_ray_tiling_matches_fused():
    """chunk_size tiling (lax.map over ray tiles) must reproduce the fused
    render exactly in deterministic mode — the reference's chunk loop is
    semantically invisible (nerf_renderer.py:188-203)."""
    cfg_fused = compose(CONF_DIR, ["+expt=pigan", *PIGAN_TINY])
    cfg_tiled = compose(CONF_DIR, ["+expt=pigan", *PIGAN_TINY,
                                   "nerf.chunk_size=64"])
    task_f = instantiate(cfg_fused.model.lm, cfg_fused, "/tmp/lgzt_tile")
    task_t = instantiate(cfg_tiled.model.lm, cfg_tiled, "/tmp/lgzt_tile")
    g_vars, _ = task_f.init(jax.random.PRNGKey(0))
    params = dict(g_vars)["params"]
    gstate = {k: v for k, v in g_vars.items() if k != "params"}
    z = task_f.sample_z(jax.random.PRNGKey(1), 2)
    # 16x16 = 256 rays > 64 → 4 tiles on the tiled config, fused otherwise
    img_f = task_f.generate(params, gstate, z, rng=jax.random.PRNGKey(2),
                            sample_res=16)
    img_t = task_t.generate(params, gstate, z, rng=jax.random.PRNGKey(2),
                            sample_res=16)
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_t),
                               atol=2e-5)


def test_ray_tiling_128px_generation():
    """machine=big-shaped 128² generation goes through the tiled path
    (16384 rays at chunk 8192 → 2 tiles) and stays finite."""
    cfg = compose(CONF_DIR, ["+expt=pigan", *PIGAN_TINY])
    task = instantiate(cfg.model.lm, cfg, "/tmp/lgzt_tile128")
    g_vars, _ = task.init(jax.random.PRNGKey(0))
    img = task.generate(dict(g_vars)["params"],
                        {k: v for k, v in g_vars.items() if k != "params"},
                        task.sample_z(jax.random.PRNGKey(1), 1),
                        rng=jax.random.PRNGKey(2), sample_res=128)
    assert img.shape == (1, 128, 128, 4)
    assert np.isfinite(np.asarray(img)).all()
