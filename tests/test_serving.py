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
