"""Data pipeline tests: MNIST idx reader, synthetic determinism, epoch
loader striping + micro-batch stacking."""
import gzip
import struct

import numpy as np
import pytest

from lightning_gan_zoo_tpu.data.datasets import MNIST, Synthetic
from lightning_gan_zoo_tpu.data.pipeline import EpochLoader


def _write_idx_images(path, images):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3))
        f.write(struct.pack(">III", *images.shape))
        f.write(images.tobytes())


def _write_idx_labels(path, labels):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 1))
        f.write(struct.pack(">I", labels.shape[0]))
        f.write(labels.tobytes())


@pytest.fixture
def mnist_root(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (20, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, (20,), dtype=np.uint8)
    _write_idx_images(raw / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(raw / "train-labels-idx1-ubyte", labels)
    # t10k as gz to exercise the gzip path
    import io
    buf = io.BytesIO()
    with gzip.open(raw / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3)
                + struct.pack(">III", *imgs[:5].shape) + imgs[:5].tobytes())
    with gzip.open(raw / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 1)
                + struct.pack(">I", 5) + labels[:5].tobytes())
    return tmp_path, imgs, labels


def test_mnist_idx_reader(mnist_root):
    root, imgs, labels = mnist_root
    ds = MNIST(str(root), train=True, img_size=28)
    assert len(ds) == 20
    out = ds.load([0, 3])
    assert out["image"].shape == (2, 28, 28, 1)
    # normalisation: (x/255 - .5)/.5
    expect = (imgs[0].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out["image"][0, :, :, 0], expect, atol=1e-6)
    assert out["label"][1] == labels[3]


def test_mnist_gzip_and_resize(mnist_root):
    root, _, _ = mnist_root
    ds = MNIST(str(root), train=False, img_size=16)
    assert len(ds) == 5
    out = ds.load([0])
    assert out["image"].shape == (1, 16, 16, 1)


def test_mnist_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        MNIST(str(tmp_path / "nope"))


def test_synthetic_deterministic():
    ds = Synthetic(n=16, img_size=8)
    a = ds.load([1, 2])["image"]
    b = ds.load([1, 2])["image"]
    np.testing.assert_array_equal(a, b)


def test_epoch_loader_stacking_and_striping():
    ds = Synthetic(n=64, img_size=8)
    loader = EpochLoader(ds, batch_size=4, n_micro=3, shuffle=True, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch() == 64 // 12
    assert batches[0]["image"].shape == (3, 4, 8, 8, 3)
    assert batches[0]["label"].shape == (3, 4)

    # two-host striping: batch_size is the GLOBAL batch — each process
    # yields its batch/process_count stripe (disjoint indices), and the
    # steps-per-epoch count equals the single-process count (training
    # semantics must not change with host count)
    l0 = EpochLoader(ds, 4, n_micro=1, shuffle=False, process_index=0,
                     process_count=2)
    l1 = EpochLoader(ds, 4, n_micro=1, shuffle=False, process_index=1,
                     process_count=2)
    b0 = next(iter(l0.epoch(0)))
    b1 = next(iter(l1.epoch(0)))
    assert b0["image"].shape == (1, 2, 8, 8, 3)
    assert not np.allclose(b0["image"], b1["image"])
    assert l0.steps_per_epoch() == 16 == \
        EpochLoader(ds, 4, n_micro=1, shuffle=False).steps_per_epoch()
    # a global batch that can't stripe evenly is a config error
    import pytest
    with pytest.raises(ValueError):
        EpochLoader(ds, 5, n_micro=1, process_index=0, process_count=2)

    # ragged dataset (n % process_count != 0): both processes must agree
    # on the superstep count — a lone extra collective dispatch would
    # deadlock the mesh
    ds31 = Synthetic(n=31, img_size=8)
    l0 = EpochLoader(ds31, 4, n_micro=1, shuffle=False, process_index=0,
                     process_count=2)
    l1 = EpochLoader(ds31, 4, n_micro=1, shuffle=False, process_index=1,
                     process_count=2)
    assert len(list(l0.epoch(0))) == len(list(l1.epoch(0))) \
        == l0.steps_per_epoch() == 7


def test_epoch_loader_reshuffles_per_epoch():
    ds = Synthetic(n=32, img_size=8)
    loader = EpochLoader(ds, batch_size=4, n_micro=1, shuffle=True, seed=7)
    e0 = next(iter(loader.epoch(0)))["label"]
    e1 = next(iter(loader.epoch(1)))["label"]
    assert not np.array_equal(e0, e1)
