"""Data pipeline tests: ImageFolder scanning, PIL eval transform, native C++
pipeline parity, calibration-subset seeding."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from adalog_tpu.data.imagenet import (
    scan_image_folder, load_eval_image, ImageNetLoader, SyntheticLoader,
)
from adalog_tpu.data import native_loader

MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def _synth_jpeg(rng, h=96, w=128, path=None):
    img = (np.clip(np.cumsum(rng.standard_normal((h, w, 3)), axis=0) * 8 + 128,
                   0, 255)).astype(np.uint8)
    pil = Image.fromarray(img)
    if path:
        pil.save(path, format="JPEG", quality=95)
        return path
    buf = io.BytesIO()
    pil.save(buf, format="JPEG", quality=95)
    return buf.getvalue()


@pytest.fixture
def image_dir(tmp_path, rng):
    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                _synth_jpeg(rng, path=str(d / f"img{i}.jpg"))
    return str(tmp_path)


def test_scan_image_folder(image_dir):
    paths, labels, classes = scan_image_folder(os.path.join(image_dir, "val"))
    assert classes == ["cat", "dog"]
    assert len(paths) == 6 and labels == [0, 0, 0, 1, 1, 1]


def test_eval_transform_shape(image_dir):
    paths, _, _ = scan_image_folder(os.path.join(image_dir, "val"))
    out = load_eval_image(paths[0], 64, 0.9, MEAN, STD)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32


@pytest.mark.skipif(not native_loader.available(),
                    reason="native library not built")
def test_native_matches_pil(rng, tmp_path):
    path = _synth_jpeg(rng, path=str(tmp_path / "x.jpg"))
    ref = load_eval_image(path, 64, 0.875, MEAN, STD)
    with open(path, "rb") as f:
        nat = native_loader.decode_preprocess(f.read(), 64, 0.875, MEAN, STD)
    # PIL resamples in u8 fixed point; agree within ~2/255 per pixel
    diff_px = (np.abs(nat - ref) * np.asarray(STD)).max() * 255
    assert diff_px < 3.0, diff_px


@pytest.mark.skipif(not native_loader.available(),
                    reason="native library not built")
def test_native_batch_load(rng, tmp_path):
    paths = [_synth_jpeg(rng, path=str(tmp_path / f"b{i}.jpg"))
             for i in range(4)]
    out = native_loader.batch_load(paths, 48, 0.9, MEAN, STD, n_threads=2)
    assert out.shape == (4, 48, 48, 3)
    assert np.isfinite(out).all() and np.abs(out).max() > 0


def test_loader_end_to_end(image_dir):
    class Spec:
        class cfg:
            img_size = 48
        crop_pct = 0.9
        mean, std = MEAN, STD

    loader = ImageNetLoader(image_dir, Spec, val_batch_size=4, num_workers=2)
    batches = list(loader.val_loader())
    assert sum(b[0].shape[0] for b in batches) == 6
    assert batches[0][0].shape[1:] == (48, 48, 3)

    calib = loader.calib_batches(num=4, batch_size=2, seed=3)
    assert len(calib) == 2 and calib[0].shape == (2, 48, 48, 3)
    # seeding is deterministic
    calib2 = loader.calib_batches(num=4, batch_size=2, seed=3)
    np.testing.assert_array_equal(calib[0], calib2[0])


def test_synthetic_loader():
    class Spec:
        class cfg:
            img_size = 32

    loader = SyntheticLoader(Spec, val_batch_size=8, n_val=16)
    batches = list(loader.val_loader())
    assert len(batches) == 2 and batches[0][0].shape == (8, 32, 32, 3)
    c1 = loader.calib_batches(8, 4, seed=1)
    c2 = loader.calib_batches(8, 4, seed=1)
    np.testing.assert_array_equal(c1[0], c2[0])


def test_calib_augmented_transform(image_dir):
    class Spec:
        class cfg:
            img_size = 48
        crop_pct = 0.9
        mean, std = MEAN, STD

    loader = ImageNetLoader(image_dir, Spec, val_batch_size=4, num_workers=1)
    aug = loader.calib_batches(num=4, batch_size=4, seed=3, augment=True)
    det = loader.calib_batches(num=4, batch_size=4, seed=3, augment=False)
    assert aug[0].shape == det[0].shape == (4, 48, 48, 3)
    # augmentation changes pixels but is deterministic under the seed
    assert not np.allclose(aug[0], det[0])
    aug2 = loader.calib_batches(num=4, batch_size=4, seed=3, augment=True)
    np.testing.assert_array_equal(aug[0], aug2[0])
