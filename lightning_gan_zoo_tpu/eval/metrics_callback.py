"""FID/KID validation monitoring — the InceptionMetrics callback, on device.

Reference behaviour (core/callback_inception_metrics.py:144-246): generate
``val.fid_n_samples`` fakes from fixed pre-split z batches, write each as PNG,
run the pip FID InceptionV3 over the fake dir and the real dir (with an
``inception_cache.npz`` stats cache), compute FID + polynomial-MMD KID.

TPU-native redesign: NO disk round-trip — fakes stream straight from the
generator into the jitted Inception pool3 extractor in batches; real
activations come from the dataset reader once and are cached next to the
dataset (the reference's ``inception_cache.npz`` contract, :155-159 —
DEVIATION: our filename is keyed by img_size/count/calibration because we
resize reals to train.img_size first, see ``_cache_path``). Greyscale →
RGB tiling and [0,1] clamping match :194-199.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.node import Config
from ..config.registry import instantiate
from . import fid as fid_ops
from .inception import build as build_inception


class InceptionMetrics:
    def __init__(self, cfg: Config, task, batch_size: Optional[int] = None,
                 logging_dir: Optional[str] = None):
        self.cfg = cfg
        self.task = task
        self.n_samples = int(cfg.val.get("fid_n_samples", 5000))
        # opt-in PNG dump of the generated samples (the reference's
        # test_samples/ dir, callback_inception_metrics.py:187-205)
        self.dump_dir: Optional[Path] = None
        if logging_dir and bool(cfg.val.get("dump_fid_samples", False)):
            self.dump_dir = Path(logging_dir) / "test_samples"
        # reference generates in batches of 50 (:166-168); never exceed the
        # sample count (avoids compiling an oversized bucket)
        self.batch_size = int(batch_size or cfg.val.get(
            "fid_batch_size", min(50, self.n_samples)))
        weights = cfg.val.get("inception_weights_path")
        self.model, self.variables, self.calibrated = build_inception(weights)
        self._acts_fn = jax.jit(
            lambda imgs: self.model.apply(self.variables, imgs))
        # fused generate→[0,1]→inception pool3, entirely on device: only the
        # (batch, 2048) activations ever cross the host boundary (the
        # reference round-trips every sample through PNG files on disk,
        # callback_inception_metrics.py:187-205)
        mean = float(cfg.train.data_mean)
        std = float(cfg.train.data_std)

        def _fused(g_params, g_state, z, rng):
            fake = self.task.generate(g_params, g_state, z, rng=rng)
            img01 = jnp.clip(fake[..., :3] * std + mean, 0.0, 1.0)
            if img01.shape[-1] == 1:
                img01 = jnp.repeat(img01, 3, axis=-1)
            # img01 only crosses the host boundary when dump_fid_samples
            # fetches it; otherwise XLA's output stays on device unread
            return self.model.apply(self.variables, img01), img01

        self._gen_acts_fn = jax.jit(_fused)
        self._real_stats = None
        self._real_acts = None

    # -- activations ----------------------------------------------------------
    def _activations_from_images(self, images01: np.ndarray) -> np.ndarray:
        """images01: (N, H, W, C) float in [0,1]; returns (N, 2048)."""
        outs = []
        bs = self.batch_size
        n = images01.shape[0]
        pad = (-n) % bs
        if pad:
            images01 = np.concatenate(
                [images01, np.repeat(images01[-1:], pad, axis=0)], axis=0)
        for i in range(0, images01.shape[0], bs):
            chunk = jnp.asarray(images01[i:i + bs])
            if chunk.shape[-1] == 1:
                chunk = jnp.repeat(chunk, 3, axis=-1)
            outs.append(np.asarray(self._acts_fn(chunk)))
        return np.concatenate(outs, axis=0)[:n]

    def _generator_activations(self, g_params, g_state, rng) -> np.ndarray:
        """n_samples fake activations in fixed batches (reference pre-splits
        z into batches of 50, :166-168), fused generation+inception on
        device."""
        outs = []
        if self.dump_dir is not None:
            # reference clear_fake_img_dir semantics (:170-176)
            import shutil
            shutil.rmtree(self.dump_dir, ignore_errors=True)
            self.dump_dir.mkdir(parents=True, exist_ok=True)
        n_batches = -(-self.n_samples // self.batch_size)
        written = 0
        for i in range(n_batches):
            r = jax.random.fold_in(rng, i)
            z = self.task.sample_z(r, self.batch_size)
            acts, imgs = self._gen_acts_fn(g_params, g_state, z,
                                           jax.random.fold_in(r, 1))
            outs.append(np.asarray(acts))
            if self.dump_dir is not None and written < self.n_samples:
                from PIL import Image
                for img in np.asarray(imgs):
                    if written >= self.n_samples:
                        break
                    Image.fromarray(
                        (img * 255).astype(np.uint8)).save(
                            self.dump_dir / f"fake_img_{written}.png")
                    written += 1
        return np.concatenate(outs, axis=0)[:self.n_samples]

    # -- real side --------------------------------------------------------------
    def _cache_path(self) -> Optional[Path]:
        """Real-activation cache keyed by everything that changes the
        activations: image size (reals are resized to train.img_size before
        inception — the reference reads its real dir at native size, so its
        single per-dir cache is resolution-independent; ours is not),
        sample count/full-dir mode, and calibration (random-init vs real
        weights produce unrelated features). An unkeyed cache silently
        poisoned cross-resolution runs in round 4."""
        root = self.cfg.dataset.get("root")
        if not root:
            return None
        img = int(self.cfg.train.img_size)
        count = ("full" if bool(self.cfg.val.get("fid_real_full", False))
                 else f"n{self.n_samples}")
        cal = "cal" if self.calibrated else "rnd"
        return Path(str(root)) / \
            f"inception_cache_{img}px_{count}_{cal}.npz"

    def _real_activations(self) -> np.ndarray:
        if self._real_acts is not None:
            return self._real_acts
        cache = self._cache_path()
        if cache and cache.exists():
            data = np.load(cache)
            if "act" in data:
                self._real_acts = data["act"]
                return self._real_acts
        ds = instantiate(self.cfg.dataset.val,
                         img_size=int(self.cfg.train.img_size),
                         n_channels=int(self.cfg.train.channels_img),
                         data_mean=float(self.cfg.train.data_mean),
                         data_std=float(self.cfg.train.data_std))
        # default: match the fake-side count (fairer small-run FID); the
        # reference caches stats over the FULL real dir
        # (callback_inception_metrics.py:213-225) — val.fid_real_full=True
        # reproduces that when real datasets are mounted
        if bool(self.cfg.val.get("fid_real_full", False)):
            n = len(ds)
        else:
            n = min(len(ds), self.n_samples)
        mean = float(self.cfg.train.data_mean)
        std = float(self.cfg.train.data_std)
        acts = []
        for i in range(0, n, self.batch_size):
            idx = list(range(i, min(i + self.batch_size, n)))
            imgs = ds.load(idx)["image"]
            imgs01 = np.clip(imgs * std + mean, 0.0, 1.0)
            acts.append(self._activations_from_images(imgs01))
        self._real_acts = np.concatenate(acts, axis=0)
        if cache:
            try:
                cache.parent.mkdir(parents=True, exist_ok=True)
                mu, sigma = fid_ops.stats_from_activations(
                    jnp.asarray(self._real_acts))
                np.savez(cache, act=self._real_acts, mu=np.asarray(mu),
                         sigma=np.asarray(sigma))
            except OSError:
                pass
        return self._real_acts

    # -- public -------------------------------------------------------------------
    def compute(self, g_params, g_state, rng) -> Dict[str, float]:
        fake_acts = self._generator_activations(g_params, g_state, rng)
        real_acts = self._real_activations()

        mu_f, sig_f = fid_ops.stats_from_activations(jnp.asarray(fake_acts))
        mu_r, sig_r = fid_ops.stats_from_activations(jnp.asarray(real_acts))
        fid = float(fid_ops.frechet_distance(mu_r, sig_r, mu_f, sig_f))
        kid = float(fid_ops.kid_from_activations(
            jax.random.fold_in(rng, 777), jnp.asarray(real_acts),
            jnp.asarray(fake_acts)))
        if not self.calibrated:
            # random-init Inception: values are self-consistent but NOT
            # comparable to published numbers — make that impossible to
            # mistake in logs/checkpoint names
            return {"fid_uncalibrated": fid, "kid_uncalibrated": kid}
        return {"fid": fid, "kid": kid}
