"""Determinism: identical seeds → identical training trajectories (the
reference explicitly runs deterministic=False; explicit PRNG threading makes
this framework reproducible by construction)."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.config import compose
from lightning_gan_zoo_tpu.config.registry import instantiate
from lightning_gan_zoo_tpu.runtime.state import create_train_state
from lightning_gan_zoo_tpu.runtime.steps import build_superstep


def _run(seed):
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=synthetic",
                             "train.img_size=16", "train.batch_size=4",
                             "train.features_disc=8", "train.features_gen=8",
                             "model.noise_dim=16", "precision=32"])
    task = instantiate(cfg.model.lm, cfg, "/tmp/lgzt_det")
    d_tx, g_tx = task.configure_optimizers(4)
    g_vars, d_vars = task.init(jax.random.PRNGKey(seed))
    state = create_train_state(g_vars, d_vars, g_tx, d_tx)
    step = jax.jit(build_superstep(task, g_tx, d_tx, 1, 1))
    batch = {"image": jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 16, 16, 3)) * 0.5,
        jnp.float32), "label": jnp.zeros((2, 4), jnp.int32)}
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append((float(m["d_loss"]), float(m["g_loss"])))
    return losses


def test_same_seed_same_trajectory():
    assert _run(7) == _run(7)


def test_different_seed_differs():
    assert _run(7) != _run(8)
