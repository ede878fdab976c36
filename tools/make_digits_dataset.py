"""Materialise sklearn's handwritten-digits set as MNIST idx files.

Zero-egress training evidence: the environment has no mounted datasets and
no network, but scikit-learn ships 1,797 real 8x8 handwritten digits
(`sklearn.datasets.load_digits`). This tool writes them in the standard
MNIST idx format (train split -> train-*, last 297 -> t10k-*) so the
framework's ordinary `dataset=mnist` path — raw idx reader, resize,
normalise (lightning_gan_zoo_tpu/data/datasets.MNIST) — runs UNCHANGED on
real image data with visual structure a GAN can demonstrably learn.

Usage:
    python tools/make_digits_dataset.py /tmp/digits_data
    python run_network.py +expt=dc_gan dataset=mnist \
        filepaths.mnist_parent_directory=/tmp/digits_data ...
"""
from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np

N_VAL = 297  # 1797 total -> 1500 train / 297 val


def _write_idx_images(path: Path, images: np.ndarray) -> None:
    n, h, w = images.shape
    with path.open("wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 3))       # uint8, 3 dims
        f.write(struct.pack(">III", n, h, w))
        f.write(images.astype(np.uint8).tobytes())


def _write_idx_labels(path: Path, labels: np.ndarray) -> None:
    with path.open("wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 1))       # uint8, 1 dim
        f.write(struct.pack(">I", len(labels)))
        f.write(labels.astype(np.uint8).tobytes())


def make_digits_dataset(parent: str | Path) -> Path:
    from sklearn.datasets import load_digits

    d = load_digits()
    # 8x8 float images in [0, 16] -> uint8 [0, 255]
    images = np.clip(d.images / 16.0 * 255.0, 0, 255).astype(np.uint8)
    labels = d.target.astype(np.uint8)

    raw = Path(parent) / "MNIST" / "raw"
    raw.mkdir(parents=True, exist_ok=True)
    _write_idx_images(raw / "train-images-idx3-ubyte", images[:-N_VAL])
    _write_idx_labels(raw / "train-labels-idx1-ubyte", labels[:-N_VAL])
    _write_idx_images(raw / "t10k-images-idx3-ubyte", images[-N_VAL:])
    _write_idx_labels(raw / "t10k-labels-idx1-ubyte", labels[-N_VAL:])
    print(f"wrote {len(images) - N_VAL} train / {N_VAL} val digits "
          f"(8x8 uint8) under {raw}")
    return raw


if __name__ == "__main__":
    make_digits_dataset(sys.argv[1] if len(sys.argv) > 1 else "/tmp/digits_data")
