"""Classifier-based sample-quality score for the digits evidence run.

Zero-egress quality metric whose DIRECTION is trustworthy: with no FID
calibration weights available (and random-feature FID ranking low-level
statistics over semantics), quality of a digits GAN is scored with a
domain classifier instead — the "MNIST Inception Score" protocol common in
GAN papers, with sklearn's digits classifier standing in for Inception:

  1. train an MLP classifier on the real sklearn digits (1500 train
     images; ~97% val accuracy in seconds on CPU),
  2. generate N samples from a checkpoint,
  3. report IS = exp(E_x[KL(p(y|x) || p(y))])  (higher = confident AND
     class-diverse; 1.0 = noise, 10 = perfect coverage upper bound),
     mean max-softmax confidence, and per-class coverage counts.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/digits_score.py \
      <ckpt_dir_or_path> [n_samples] [--json]
  python tools/digits_score.py --init   # untrained-generator baseline
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OVERRIDES = [
    "+expt=dc_gan", "dataset=mnist",
    "filepaths.mnist_parent_directory=/tmp/digits_data",
    "train.img_size=16", "train.batch_size=64",
    "train.features_gen=32", "train.features_disc=32",
    "calc_fid=False", "save_ckpts=False", "seed=42",
]


def train_classifier():
    from sklearn.datasets import load_digits
    from sklearn.neural_network import MLPClassifier

    d = load_digits()
    x = (d.images / 16.0).reshape(len(d.images), -1).astype(np.float32)
    y = d.target
    clf = MLPClassifier(hidden_layer_sizes=(128,), max_iter=400,
                        random_state=0)
    clf.fit(x[:-297], y[:-297])
    acc = float(clf.score(x[-297:], y[-297:]))
    return clf, acc


def generate(ckpt: Path | None, n: int) -> np.ndarray:
    """n generated images in [0,1], shape (n, 8, 8) — classifier input."""
    import jax
    import jax.numpy as jnp

    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.config.registry import instantiate
    from lightning_gan_zoo_tpu.runtime.checkpoint import CheckpointManager
    from lightning_gan_zoo_tpu.runtime.state import create_train_state

    cfg = compose(REPO / "conf", OVERRIDES)
    task = instantiate(cfg.model.lm, cfg, "/tmp/digits_score")
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    g_params = dict(g_vars)["params"]
    g_state = {k: v for k, v in g_vars.items() if k != "params"}
    if ckpt is not None:
        d_tx, g_tx = task.configure_optimizers(steps_per_epoch=1)
        template = jax.device_get(create_train_state(
            g_vars, d_vars, g_tx, d_tx, extra=task.initial_extra()))
        path = CheckpointManager.find_ckpt(ckpt) or Path(ckpt)
        state, meta = CheckpointManager(None).restore(path, template)
        print(f"# restored {path.name} (epoch {meta.get('epoch')})")
        g_params = state.eval_g_params     # EMA params when enabled
        g_state = state.g_state

    outs = []
    bs = 64
    for i in range(0, n, bs):
        z = task.sample_z(jax.random.fold_in(jax.random.PRNGKey(7), i), bs)
        img = task.generate(g_params, g_state, z,
                            rng=jax.random.PRNGKey(i))
        img01 = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)[..., 0]   # (bs,16,16)
        img8 = jax.image.resize(img01, (bs, 8, 8), "linear")
        # bf16 policy outputs are not sklearn-numeric — cast on the host
        outs.append(np.asarray(img8, np.float32))
    return np.concatenate(outs)[:n]


def score(clf, imgs: np.ndarray) -> dict:
    p = clf.predict_proba(imgs.reshape(len(imgs), -1))
    p = np.clip(p, 1e-12, 1.0)
    marginal = p.mean(axis=0)
    kl = (p * (np.log(p) - np.log(marginal[None]))).sum(axis=1)
    preds = p.argmax(axis=1)
    return {
        "inception_score_digits": float(np.exp(kl.mean())),
        "mean_confidence": float(p.max(axis=1).mean()),
        "class_coverage": {int(c): int((preds == c).sum())
                           for c in range(10)},
        "n": int(len(imgs)),
    }


def main(argv):
    as_json = "--json" in argv
    argv = [a for a in argv if a != "--json"]
    ckpt = None if (not argv or argv[0] == "--init") else Path(argv[0])
    n = int(argv[1]) if len(argv) > 1 else 512

    clf, acc = train_classifier()
    print(f"# classifier val accuracy: {acc:.3f}")
    imgs = generate(ckpt, n)
    out = score(clf, imgs)
    out["classifier_val_accuracy"] = round(acc, 4)
    print(json.dumps(out) if as_json else
          "\n".join(f"{k}: {v}" for k, v in out.items()))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
