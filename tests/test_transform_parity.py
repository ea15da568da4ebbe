"""Transform parity against timm's eval preprocessing, on REAL JPEGs.

The accuracy-parity argument stands on the data pipeline producing the exact
pixels timm's ``create_transform`` feeds the reference models — a half-pixel
interpolation difference silently shifts every accuracy number (reference
datasets.py:125-130 resolves the transform from the model's pretrained cfg).

This image has neither timm nor torchvision, so the oracle below is an
INDEPENDENT reimplementation of the exact upstream op sequence, written
line-by-line from the pinned sources (timm 0.9.2 transforms_factory.py
``transforms_imagenet_eval`` + torchvision 0.11 ``functional.resize`` /
``center_crop`` / ``to_tensor``), operating on the same PIL decode/resample
calls torchvision itself delegates to:

    scale_size = int(math.floor(img_size / crop_pct))          # timm
    Resize(scale_size):  short side -> scale_size,
        long side -> int(scale_size * long / short)            # truncation
    CenterCrop(img_size): top/left = int(round((d - c) / 2.0)) # banker's
    ToTensor: uint8 / 255; Normalize(mean, std)

The bundled JPEGs are real libjpeg-decoded files with odd dimensions chosen
to hit each integer-rounding branch (248-vs-249 scale size at crop_pct=0.9,
truncated aspect sides, odd crop margins).
"""

import math
import os

import numpy as np
import pytest
from PIL import Image

from adalog_tpu.data.imagenet import load_eval_image

DATA = os.path.join(os.path.dirname(__file__), "data")
JPEGS = sorted(f for f in os.listdir(DATA) if f.endswith(".jpg"))

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def timm_eval_oracle(path, img_size, crop_pct, mean, std):
    """timm 0.9.2 eval transform, reimplemented from upstream sources."""
    img = Image.open(path).convert("RGB")
    scale_size = int(math.floor(img_size / crop_pct))
    w, h = img.size
    # torchvision 0.11 F.resize, int-size path
    if w <= h:
        ow, oh = scale_size, int(scale_size * h / w)
    else:
        oh, ow = scale_size, int(scale_size * w / h)
    img = img.resize((ow, oh), Image.BICUBIC)
    # torchvision 0.11 F.center_crop
    left = int(round((ow - img_size) / 2.0))
    top = int(round((oh - img_size) / 2.0))
    img = img.crop((left, top, left + img_size, top + img_size))
    # ToTensor + Normalize (kept HWC here)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


@pytest.mark.parametrize("jpg", JPEGS)
@pytest.mark.parametrize("img_size,crop_pct", [(224, 0.9), (224, 0.875),
                                               (384, 1.0)])
def test_eval_transform_bitwise_vs_timm_oracle(jpg, img_size, crop_pct):
    """Our PIL eval path must be BIT-FOR-BIT the timm transform (both sides
    bottom out in the same PIL resample, so any difference is an integer
    size/offset bug, exactly the silent-drift class)."""
    path = os.path.join(DATA, jpg)
    golden = timm_eval_oracle(path, img_size, crop_pct, MEAN, STD)
    ours = load_eval_image(path, img_size, crop_pct, MEAN, STD, "bicubic")
    np.testing.assert_array_equal(ours, golden)


def test_scale_size_is_floor_not_round():
    """The 224/0.9 = 248.888… case: timm floors to 248; round() gives 249."""
    assert int(math.floor(224 / 0.9)) == 248


@pytest.mark.parametrize("jpg", JPEGS)
def test_native_loader_matches_timm_oracle(jpg):
    """The C++ pipeline reproduces the same geometry; resampled pixel values
    may differ slightly from PIL (float vs per-stage-u8-clamped convolution),
    bounded by the documented tolerance."""
    from adalog_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    path = os.path.join(DATA, jpg)
    golden = timm_eval_oracle(path, 224, 0.9, MEAN, STD)
    out = native_loader.batch_load([path], 224, 0.9, MEAN, STD)[0]
    # undo the normalize to compare in u8 pixel units
    g_px = golden * np.asarray(STD, np.float32) * 255.0
    o_px = out * np.asarray(STD, np.float32) * 255.0
    diff = np.abs(g_px - o_px)
    assert diff.max() < 3.0, diff.max()
    assert diff.mean() < 0.3, diff.mean()
