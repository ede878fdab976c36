"""StableHLO generator export (serving/export.py): the serialized artifact
must deserialize and reproduce task.generate without the framework."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from lightning_gan_zoo_tpu.serving.export import export_generator

CONF = Path(__file__).resolve().parents[1] / "conf"


def test_export_roundtrip_dcgan(tmp_path):
    out = tmp_path / "g.stablehlo"
    path, sidecar = export_generator(
        CONF, ["+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
               "train.img_size=32"], batch=4, out_path=out)
    assert path.exists() and path.stat().st_size > 1000
    meta = json.loads(path.with_suffix(".stablehlo.json").read_text())
    assert meta["z_dim"] == sidecar["z_dim"]

    g = jexport.deserialize(path.read_bytes())
    z = jax.random.normal(jax.random.PRNGKey(1), (4, sidecar["z_dim"]))
    img = g.call(z, jnp.int32(0))
    assert img.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(img, np.float32)).all()
    # deterministic given (z, seed); same z re-run matches
    img2 = g.call(z, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(img, np.float32),
                                  np.asarray(img2, np.float32))


def test_export_stochastic_views_hologan(tmp_path):
    """HoloGAN samples a view inside G — different seeds must give
    different images through the exported artifact (RNG stays live)."""
    out = tmp_path / "holo.stablehlo"
    path, sidecar = export_generator(
        CONF, ["+expt=hologan", "dataset=synthetic", "calc_fid=False",
               "train.img_size=32"], batch=2, out_path=out)
    g = jexport.deserialize(path.read_bytes())
    z = jax.random.normal(jax.random.PRNGKey(2), (2, sidecar["z_dim"]))
    a = np.asarray(g.call(z, jnp.int32(0)), np.float32)
    b = np.asarray(g.call(z, jnp.int32(7)), np.float32)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-4


def test_export_multiplatform_dcgan(tmp_path):
    """dc_gan has no platform-specific lowering — the multi-platform
    (tpu+cpu) artifact must be produced, with no fallback_reason recorded
    (serving/export.py narrow-fallback contract)."""
    out = tmp_path / "g.stablehlo"
    _, sidecar = export_generator(
        CONF, ["+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
               "train.img_size=32"], batch=2, out_path=out)
    assert set(sidecar["platforms"]) == {"tpu", "cpu"}
    assert "fallback_reason" not in sidecar


def test_export_from_trained_checkpoint(tmp_path):
    """serving.ckpt path: export a generator restored from a saved
    checkpoint (the module's stated purpose) and verify the artifact
    reproduces the restored params' output — not the random init's."""
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.config.registry import instantiate
    from lightning_gan_zoo_tpu.runtime.checkpoint import CheckpointManager
    from lightning_gan_zoo_tpu.runtime.state import create_train_state

    overrides = ["+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
                 "train.img_size=32"]
    cfg = compose(CONF, overrides)
    task = instantiate(cfg.model.lm, cfg, str(tmp_path))
    g_vars, d_vars = task.init(jax.random.PRNGKey(3))
    d_tx, g_tx = task.configure_optimizers(steps_per_epoch=1)
    # perturb G params so the checkpoint differs from export's init(seed=0)
    g_vars = dict(g_vars)
    g_vars["params"] = jax.tree.map(lambda p: p + 0.05, g_vars["params"])
    state = create_train_state(g_vars, d_vars, g_tx, d_tx,
                               extra=task.initial_extra())
    ckpt_dir = tmp_path / "ckpts"
    CheckpointManager(ckpt_dir).save_best(state, epoch=3, fid=21.5)

    out = tmp_path / "g.stablehlo"
    path, sidecar = export_generator(CONF, overrides, batch=2, out_path=out,
                                     ckpt=str(ckpt_dir))
    g = jexport.deserialize(path.read_bytes())
    z = jax.random.normal(jax.random.PRNGKey(4), (2, sidecar["z_dim"]))
    got = np.asarray(g.call(z, jnp.int32(0)), np.float32)
    want = np.asarray(task.generate(
        g_vars["params"], {k: v for k, v in g_vars.items() if k != "params"},
        z), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_pose_conditioned_hologan(tmp_path):
    """serving.pose=true: the exported callable takes an explicit (B, 6)
    pose row — deterministic per (z, view, seed), sensitive to the view
    (the serving-time counterpart of the reference's azimuth sweeps)."""
    out = tmp_path / "holo_pose.stablehlo"
    path, sidecar = export_generator(
        CONF, ["+expt=hologan", "dataset=synthetic", "calc_fid=False",
               "train.img_size=32"], batch=2, out_path=out, pose=True)
    assert sidecar["pose"] is True and sidecar["view_dim"] == 6
    g = jexport.deserialize(path.read_bytes())
    z = jax.random.normal(jax.random.PRNGKey(3), (2, sidecar["z_dim"]))

    def view(az_deg, el_deg):
        row = np.array([np.deg2rad(az_deg), np.deg2rad(el_deg),
                        1.0, 0.0, 0.0, 0.0], np.float32)
        return jnp.asarray(np.tile(row, (2, 1)))

    a = np.asarray(g.call(z, view(0, 90), jnp.int32(0)), np.float32)
    a2 = np.asarray(g.call(z, view(0, 90), jnp.int32(0)), np.float32)
    b = np.asarray(g.call(z, view(60, 90), jnp.int32(0)), np.float32)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_array_equal(a, a2)      # fixed pose => deterministic
    assert np.abs(a - b).max() > 1e-4         # pose changes the render


PIGAN_TINY = ["+expt=pigan", "machine=local", "dataset=synthetic",
              "calc_fid=False", "model.noise_dim=16",
              "nerf.siren_dim_hidden=32", "nerf.siren_num_layers=2",
              "nerf.n_pts_per_ray=4", "nerf.n_pts_per_ray_fine=4",
              "train.img_size=32"]


def test_export_pigan_default_and_pose(tmp_path):
    """Default (z, seed) export must work for the NeRF families too (the
    task.generate extra-kwarg path regressed unnoticed while only
    dc_gan/hologan were covered), and serving.pose=true renders a fixed
    camera."""
    # default export (random camera per seed)
    path0, sc0 = export_generator(CONF, PIGAN_TINY, batch=2,
                                  out_path=tmp_path / "pigan.stablehlo")
    g0 = jexport.deserialize(path0.read_bytes())
    z = jax.random.normal(jax.random.PRNGKey(4), (2, sc0["z_dim"]))
    img0 = g0.call(z, jnp.int32(0))
    assert np.isfinite(np.asarray(img0)).all()

    # pose-conditioned export
    path, sidecar = export_generator(CONF, PIGAN_TINY, batch=2,
                                     out_path=tmp_path / "pose.stablehlo",
                                     pose=True)
    g = jexport.deserialize(path.read_bytes())
    row = np.array([0.3, 1.4, 1.0, 0.0, 0.0, 0.0], np.float32)
    img = g.call(z, jnp.asarray(np.tile(row, (2, 1))), jnp.int32(0))
    assert img.shape[0] == 2 and np.isfinite(np.asarray(img)).all()


def test_export_pose_rejects_2d_family(tmp_path):
    import pytest
    with pytest.raises(ValueError, match="view-conditioned"):
        export_generator(
            CONF, ["+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
                   "train.img_size=32"], batch=2,
            out_path=tmp_path / "x.stablehlo", pose=True)


def test_export_dynamic_batch(tmp_path):
    """serving.dynamic=true: ONE artifact with a symbolic batch dimension
    serves any batch size (jax.export shape polymorphism) — the
    TPU-serving norm where request batches vary."""
    out = tmp_path / "g_dyn.stablehlo"
    path, sidecar = export_generator(
        CONF, ["+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
               "train.img_size=32"], batch=4, out_path=out,
        dynamic_batch=True)
    assert sidecar["batch"] == "dynamic", sidecar
    g = jexport.deserialize(path.read_bytes())
    for b in (3, 7):
        z = jax.random.normal(jax.random.PRNGKey(b), (b, sidecar["z_dim"]))
        img = g.call(z, jnp.int32(0))
        assert img.shape == (b, 32, 32, 3)
        assert np.isfinite(np.asarray(img, np.float32)).all()
    # dynamic-batch output matches a static export at the same (z, seed)
    out_s = tmp_path / "g_static.stablehlo"
    path_s, _ = export_generator(
        CONF, ["+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
               "train.img_size=32"], batch=3, out_path=out_s)
    gs = jexport.deserialize(path_s.read_bytes())
    z = jax.random.normal(jax.random.PRNGKey(9), (3, sidecar["z_dim"]))
    np.testing.assert_allclose(
        np.asarray(g.call(z, jnp.int32(5)), np.float32),
        np.asarray(gs.call(z, jnp.int32(5)), np.float32),
        atol=2e-5)


def test_export_bf16_weights(tmp_path):
    """serving.dtype=bf16 halves the baked-constant payload; outputs stay
    close to the f32 export (training computes in bf16 anyway)."""
    ov = ["+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
          "train.img_size=32"]
    p32, _ = export_generator(CONF, ov, batch=4,
                              out_path=tmp_path / "g32.stablehlo")
    p16, sc = export_generator(CONF, ov, batch=4,
                               out_path=tmp_path / "g16.stablehlo",
                               dtype="bf16")
    assert sc["weights_dtype"] == "bf16"
    assert p16.stat().st_size < 0.66 * p32.stat().st_size
    g32 = jexport.deserialize(p32.read_bytes())
    g16 = jexport.deserialize(p16.read_bytes())
    z = jax.random.normal(jax.random.PRNGKey(2), (4, sc["z_dim"]))
    a = np.asarray(g32.call(z, jnp.int32(0)), np.float32)
    b = np.asarray(g16.call(z, jnp.int32(0)), np.float32)
    assert np.isfinite(b).all()
    # images live in [-1, 1]; bf16 weight rounding stays a small perturbation
    assert np.abs(a - b).mean() < 0.05, np.abs(a - b).mean()
