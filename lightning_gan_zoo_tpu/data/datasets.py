"""Dataset readers: ImageFolder, MNIST, synthetic.

Replaces the torchvision dataset targets in conf/dataset/*.yaml
(torchvision.datasets.ImageFolder / MNIST — reference
core/lightning_module.py:89-102). Each reader exposes:

  * ``__len__``
  * ``load(indices) -> dict(image=float32 NHWC in normalised range,
                            label=int32[n])``

Resize + normalise ((x/255 − mean)/std, matching the reference transform
stack at core/lightning_module.py:42-47) happens at load. The AnimalAnalysis
variant (ANIGAN) additionally returns the per-image shape-analysis arrays
(core/anigan/dataset.py:7-28).
"""
from __future__ import annotations

import gzip
import os
import struct
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

_IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm", ".tif",
             ".tiff"}


def _normalise(img01: np.ndarray, mean: float, std: float) -> np.ndarray:
    return (img01 - mean) / std


class BaseDataset:
    def __len__(self) -> int:
        raise NotImplementedError

    def load(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        raise NotImplementedError


class ImageFolder(BaseDataset):
    """Class-per-subdirectory image folder (torchvision.datasets.ImageFolder
    semantics). Decodes with PIL, resizes with bilinear to img_size."""

    def __init__(self, root: str, img_size: int = 64, n_channels: int = 3,
                 data_mean: float = 0.5, data_std: float = 0.5, **_ignored):
        self.root = Path(root)
        self.img_size = int(img_size)
        self.n_channels = int(n_channels)
        self.mean, self.std = float(data_mean), float(data_std)
        self.samples: list[tuple[Path, int]] = []
        if self.root.is_dir():
            classes = sorted(p for p in self.root.iterdir() if p.is_dir())
            for ci, cdir in enumerate(classes):
                for f in sorted(cdir.rglob("*")):
                    if f.suffix.lower() in _IMG_EXTS:
                        self.samples.append((f, ci))
        if not self.samples:
            raise FileNotFoundError(
                f"ImageFolder: no images under {self.root} "
                "(expected <root>/<class>/<img>)")

    def __len__(self):
        return len(self.samples)

    def load(self, indices):
        paths = [self.samples[int(i)][0] for i in indices]
        labels = np.asarray([self.samples[int(i)][1] for i in indices],
                            np.int32)
        imgs = self._load_native(paths)
        if imgs is None:
            imgs = self._load_pil(paths)
        return {"image": imgs, "label": labels}

    def _load_native(self, paths):
        """C++ fastimage path: batched multithreaded decode+resize+normalise
        (native/fastimage.cpp); returns None when unavailable."""
        from . import native_loader
        if not native_loader.available():
            return None
        try:
            return native_loader.load_batch(paths, self.img_size,
                                            self.n_channels, self.mean,
                                            self.std)
        except IOError:
            return self._load_pil(paths)  # odd formats → PIL fallback

    def _load_pil(self, paths):
        from PIL import Image
        s = self.img_size
        imgs = np.empty((len(paths), s, s, self.n_channels), np.float32)
        for j, path in enumerate(paths):
            with Image.open(path) as im:
                im = im.convert("RGB" if self.n_channels == 3 else "L")
                im = im.resize((s, s), Image.BILINEAR)
                arr = np.asarray(im, np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            imgs[j] = arr
        return _normalise(imgs, self.mean, self.std)


class MNIST(BaseDataset):
    """Raw idx-format MNIST reader (no torchvision). Looks for the standard
    (t10k|train)-(images|labels)-idx?-ubyte[.gz] files under root/MNIST/raw
    or root directly. ``download`` is accepted for config compatibility but
    ignored (no network egress in this environment)."""

    def __init__(self, root: str, train: bool = True, img_size: int = 64,
                 n_channels: int = 1, data_mean: float = 0.5,
                 data_std: float = 0.5, download: bool = False, **_ignored):
        self.img_size = int(img_size)
        self.n_channels = int(n_channels)
        self.mean, self.std = float(data_mean), float(data_std)
        prefix = "train" if train else "t10k"
        candidates = [Path(root) / "MNIST" / "raw", Path(root) / "raw",
                      Path(root)]
        img_path = lbl_path = None
        for base in candidates:
            for suffix in ("", ".gz"):
                ip = base / f"{prefix}-images-idx3-ubyte{suffix}"
                lp = base / f"{prefix}-labels-idx1-ubyte{suffix}"
                if ip.exists() and lp.exists():
                    img_path, lbl_path = ip, lp
                    break
            if img_path:
                break
        if img_path is None:
            raise FileNotFoundError(
                f"MNIST idx files not found under {root} "
                "(no network egress — place the raw files there)")
        self.images = self._read_idx(img_path)   # (N, 28, 28) uint8
        self.labels = self._read_idx(lbl_path)   # (N,) uint8

    @staticmethod
    def _read_idx(path: Path) -> np.ndarray:
        op = gzip.open if path.suffix == ".gz" else open
        with op(path, "rb") as f:
            zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
            shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
            return np.frombuffer(f.read(), np.uint8).reshape(shape)

    def __len__(self):
        return len(self.images)

    def load(self, indices):
        from PIL import Image
        s = self.img_size
        out = np.empty((len(indices), s, s, 1), np.float32)
        for j, i in enumerate(indices):
            im = Image.fromarray(self.images[int(i)])
            if s != 28:
                im = im.resize((s, s), Image.BILINEAR)
            out[j, :, :, 0] = np.asarray(im, np.float32) / 255.0
        labels = self.labels[np.asarray(indices, np.int64)].astype(np.int32)
        return {"image": _normalise(out, self.mean, self.std),
                "label": labels}


class Synthetic(BaseDataset):
    """Deterministic procedural images — smoke tests and benchmarks when no
    real dataset is mounted (the reference has no equivalent; its nearest is
    the celeb_a_sample small-run config)."""

    def __init__(self, n: int = 512, img_size: int = 64, n_channels: int = 3,
                 data_mean: float = 0.5, data_std: float = 0.5,
                 seed: int = 0, **_ignored):
        self.n = int(n)
        self.img_size = int(img_size)
        self.n_channels = int(n_channels)
        self.mean, self.std = float(data_mean), float(data_std)
        self.seed = int(seed)

    def __len__(self):
        return self.n

    def load(self, indices):
        s, c = self.img_size, self.n_channels
        idx = np.asarray(indices, np.int64)
        # cheap but image-like: per-index gaussian blobs + gradients
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        rng_phase = (idx[:, None, None].astype(np.float32) * 0.61803) % 1.0
        base = 0.5 + 0.5 * np.sin(
            2 * np.pi * (xx[None] * (1 + idx[:, None, None] % 3)
                         + yy[None] + rng_phase))
        cx = 0.25 + 0.5 * ((idx * 37 % 101) / 101.0)
        cy = 0.25 + 0.5 * ((idx * 57 % 89) / 89.0)
        blob = np.exp(-(((xx[None] - cx[:, None, None]) ** 2
                         + (yy[None] - cy[:, None, None]) ** 2) / 0.02))
        img = np.clip(0.6 * base + 0.4 * blob, 0.0, 1.0).astype(np.float32)
        img = np.repeat(img[..., None], c, axis=-1)
        if c >= 3:
            img[..., 1] *= 0.8
            img[..., 2] *= 0.6
        return {"image": _normalise(img, self.mean, self.std),
                "label": (idx % 10).astype(np.int32)}


class AnimalAnalysisFolder(ImageFolder):
    """ImageFolder + per-image npz shape analysis (ANIGAN —
    core/anigan/dataset.py:7-28). Returns the analysis dict with keys
    cam_pred, mean_shape, verts, kp_verts, mask_pred, faces."""

    _ANALYSIS_KEYS = ("cam_pred", "mean_shape", "verts", "kp_verts",
                      "mask_pred", "faces")

    def __init__(self, root: str, analysis_root: str, **kwargs):
        super().__init__(root, **kwargs)
        self.analysis_root = Path(analysis_root)

    def load(self, indices):
        out = super().load(indices)
        per_key: Dict[str, list] = {k: [] for k in self._ANALYSIS_KEYS}
        for i in indices:
            path, _ = self.samples[int(i)]
            # reference maps <img>.png → <img>.npz (core/anigan/dataset.py:21)
            npz = np.load(self.analysis_root / (path.stem + ".npz"))
            for k in self._ANALYSIS_KEYS:
                if k in npz:
                    per_key[k].append(np.asarray(npz[k], np.float32))
        analysis = {k: np.stack(v) for k, v in per_key.items() if v}
        out["shape_analysis"] = analysis
        return out
