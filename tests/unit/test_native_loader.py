"""Native C++ decode+resize loader vs PIL (SURVEY.md §2 "Input pipeline" —
the GIL-free host decode path). Skipped cleanly when the toolchain or image
libs are missing."""

import os
import tempfile

import numpy as np
import pytest

from uig.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not buildable here"
)


@pytest.fixture(scope="module")
def image_files():
    from PIL import Image

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    paths = {"png": [], "jpg": []}
    for i in range(6):
        arr = rng.integers(0, 255, (100 + 7 * i, 160 - 5 * i, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"{i}.png")
        Image.fromarray(arr).save(p)
        paths["png"].append(p)
        j = os.path.join(tmp, f"{i}.jpg")
        Image.fromarray(arr).save(j, quality=95)
        paths["jpg"].append(j)
    return paths


def test_png_matches_pil_bilinear(image_files):
    from PIL import Image

    for p in image_files["png"]:
        got = native_loader.decode_resize(p, 64)
        ref = np.asarray(Image.open(p).resize((64, 64), Image.BILINEAR))
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_decodes_close_to_pil(image_files):
    from PIL import Image

    for p in image_files["jpg"]:
        got = native_loader.decode_resize(p, 64).astype(float)
        ref = np.asarray(
            Image.open(p).convert("RGB").resize((64, 64), Image.BILINEAR)
        ).astype(float)
        # different IDCT implementations: allow small mean deviation
        assert np.abs(got - ref).mean() < 3.0


def test_batch_equals_singles(image_files):
    paths = image_files["png"]
    batch = native_loader.decode_batch(paths, 48, n_threads=4)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(batch[i], native_loader.decode_resize(p, 48))


def test_missing_file_raises():
    with pytest.raises(IOError):
        native_loader.decode_resize("/nonexistent/x.png", 32)


def test_folder_dataset_native_path(image_files, tmp_path):
    from uig.data.datasets import FolderDataset

    d = os.path.dirname(image_files["png"][0])
    ds = FolderDataset(d, load_size=32, decoder="native")
    assert ds.decoder == "native"
    img = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    batch = ds.get_batch([0, 1, 2])
    assert batch.shape == (3, 32, 32, 3)
