"""Native C++ fastimage loader: build, decode parity vs PIL, ImageFolder
integration."""
import numpy as np
import pytest
from PIL import Image

from lightning_gan_zoo_tpu.data import native_loader
from lightning_gan_zoo_tpu.data.datasets import ImageFolder


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        (root / cls).mkdir()
        for i in range(3):
            arr = (rng.uniform(0, 255, (37, 41, 3))).astype(np.uint8)
            Image.fromarray(arr).save(root / cls / f"{i}.png")
            Image.fromarray(arr).save(root / cls / f"{i}.jpg", quality=95)
    return root


def test_native_library_builds():
    assert native_loader.available(), "g++/libjpeg/libpng expected in image"


def test_decode_parity_with_pil(image_tree):
    paths = sorted(str(p) for p in (image_tree / "a").glob("*.png"))
    got = native_loader.load_batch(paths, 16, 3, 0.5, 0.5)
    assert got.shape == (3, 16, 16, 3)
    for j, p in enumerate(paths):
        with Image.open(p) as im:
            ref = np.asarray(im.convert("RGB").resize((16, 16),
                                                      Image.BILINEAR),
                             np.float32) / 255.0
        ref = (ref - 0.5) / 0.5
        # PIL's bilinear uses slightly different tap weighting at downscale
        # (it averages a support window); allow a loose tolerance
        assert np.mean(np.abs(got[j] - ref)) < 0.12


def test_jpeg_decodes(image_tree):
    paths = sorted(str(p) for p in (image_tree / "b").glob("*.jpg"))
    got = native_loader.load_batch(paths, 8, 3, 0.0, 1.0)
    assert got.shape == (3, 8, 8, 3)
    assert np.isfinite(got).all()
    assert got.min() >= -1e-5 and got.max() <= 1.0 + 1e-5


def test_greyscale_output(image_tree):
    paths = [str(next((image_tree / "a").glob("*.png")))]
    got = native_loader.load_batch(paths, 8, 1, 0.5, 0.5)
    assert got.shape == (1, 8, 8, 1)


def test_image_folder_uses_native(image_tree):
    ds = ImageFolder(str(image_tree), img_size=16, n_channels=3)
    out = ds.load([0, 1, 2, 3])
    assert out["image"].shape == (4, 16, 16, 3)
    assert out["label"].shape == (4,)
    assert np.isfinite(out["image"]).all()


def test_missing_file_raises(image_tree):
    with pytest.raises(IOError):
        native_loader.load_batch([str(image_tree / "nope.png")], 8, 3,
                                 0.5, 0.5)