"""Native C++ loader (runtime/image_io.cc): built in-session and golden-tested
against PIL — the exact reference input semantics it replaces
(tools/dataset.py:139-150: PIL decode, `.convert("RGB")`, BILINEAR img /
NEAREST mask resize).

Bounds (asserted):
  * decode with no resize: bit-exact vs PIL for RGB PNG/JPEG (image path) and
    gray + palette-index PNG (mask path — raw stored values, like PIL's
    no-convert mask read).
  * lossy-for-labels inputs (16-bit gray PNG, true-RGB mask, color JPEG as
    mask) are REFUSED by the native path → the caller falls back to PIL, so
    label values can never be silently transformed.
  * NEAREST resize: bit-exact (same left-edge sample-point arithmetic).
  * BILINEAR resize: BIT-EXACT — the native path reproduces Pillow's
    fixed-point pipeline (int32 coefficients at PRECISION_BITS=22, uint8
    horizontal intermediate), eliminating the former "±1 level" delta.
"""

import os
import subprocess

import numpy as np
import pytest
from PIL import Image

from adaptersis_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    """Build the .so from scratch — the test FAILS (not skips) if the native
    runtime stops compiling, per the CI-build requirement."""
    rt = os.path.join(os.path.dirname(native.__file__), "..", "..", "runtime")
    r = subprocess.run(["make", "-B", "-C", os.path.abspath(rt)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"native build failed:\n{r.stdout}\n{r.stderr}"
    # reset the module's load cache so it picks up the fresh .so
    native._lib = None
    native._tried = False
    assert native.available(), "library built but failed to load"


def _imgs(tmp_path):
    rng = np.random.default_rng(0)
    out = {}

    rgb = rng.integers(0, 256, (37, 53, 3), np.uint8)
    p = tmp_path / "rgb.png"
    Image.fromarray(rgb).save(p)
    out["rgb_png"] = str(p)

    gray = rng.integers(0, 256, (41, 29), np.uint8)
    p = tmp_path / "gray.png"
    Image.fromarray(gray, "L").save(p)
    out["gray_png"] = str(p)

    # palette PNG — the mask format the reference datasets use
    pal = rng.integers(0, 5, (33, 44), np.uint8)
    im = Image.fromarray(pal, "P")
    im.putpalette(sum([[(i * 50) % 256, (i * 40) % 256, (i * 30) % 256]
                       for i in range(256)], []))
    p = tmp_path / "pal.png"
    im.save(p)
    out["pal_png"] = str(p)

    # 16-bit grayscale PNG → PIL "I;16"; native strips to 8-bit high byte
    g16 = rng.integers(0, 65536, (25, 31), np.uint16)
    p = tmp_path / "g16.png"
    Image.fromarray(g16, "I;16").save(p)
    out["g16_png"] = str(p)

    p = tmp_path / "rgb.jpg"
    Image.fromarray(rgb).save(p, quality=90)
    out["rgb_jpg"] = str(p)
    return out


def _pil_rgb(path, size=None, resample=Image.BILINEAR):
    with open(path, "rb") as f:
        im = Image.open(f).convert("RGB")
    if size is not None:
        im = im.resize(size[::-1], resample=resample)  # PIL takes (W, H)
    return np.asarray(im, np.uint8)


def _pil_gray(path, size=None, resample=Image.NEAREST):
    with open(path, "rb") as f:
        im = Image.open(f)
        im.load()
    if size is not None:
        im = im.resize(size[::-1], resample=resample)
    a = np.asarray(im)
    if a.ndim == 3:
        a = a[..., 0]
    if a.dtype != np.uint8:
        a = (a.astype(np.uint32) >> 8).astype(np.uint8)  # 16-bit strip
    return a


def test_decode_exact_vs_pil(tmp_path):
    files = _imgs(tmp_path)
    for key in ("rgb_png", "rgb_jpg", "gray_png", "pal_png"):
        path = files[key]
        with Image.open(path) as im:
            h, w = im.height, im.width
        if "rgb" in key:
            got = native.load_image(path, (h, w), "rgb")
            want = _pil_rgb(path)
        else:
            got = native.load_image(path, (h, w), "gray")
            want = _pil_gray(path)
        assert got is not None, key
        np.testing.assert_array_equal(got, want, err_msg=key)


def test_lossy_mask_formats_are_refused(tmp_path):
    """16-bit gray and color inputs as MASKS must return None (PIL fallback)
    rather than transformed label values."""
    files = _imgs(tmp_path)
    assert native.load_image(files["g16_png"], (10, 10), "gray") is None
    assert native.load_image(files["rgb_png"], (10, 10), "gray") is None
    assert native.load_image(files["rgb_jpg"], (10, 10), "gray") is None


def test_nearest_resize_exact_vs_pil(tmp_path):
    files = _imgs(tmp_path)
    for key in ("gray_png", "pal_png"):
        for size in ((16, 16), (64, 80), (33, 44)):
            got = native.load_image(files[key], size, "gray", "nearest")
            want = _pil_gray(files[key], size, Image.NEAREST)
            np.testing.assert_array_equal(got, want, err_msg=f"{key} {size}")


@pytest.mark.parametrize("size", [(16, 16), (128, 96), (37, 53), (588, 588)])
def test_bilinear_resize_exact_vs_pil(tmp_path, size):
    files = _imgs(tmp_path)
    for key in ("rgb_png", "rgb_jpg"):
        got = native.load_image(files[key], size, "rgb", "bilinear")
        want = _pil_rgb(files[key], size, Image.BILINEAR)
        np.testing.assert_array_equal(got, want, err_msg=f"{key} {size}")


def test_batch_load_matches_single(tmp_path):
    files = _imgs(tmp_path)
    paths = [files["rgb_png"], files["rgb_jpg"]] * 3
    batch = native.load_batch(paths, (40, 48), "rgb", "bilinear", n_threads=4)
    assert batch is not None and batch.shape == (6, 40, 48, 3)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(batch[i], native.load_image(p, (40, 48)))


def test_dataset_native_path_matches_pil_path(tmp_path):
    """End-to-end: a Robomis-layout dataset read through the native fast path
    must match the PIL fallback (mask ids exactly; image within 1 level)."""
    from adaptersis_tpu.data.datasets import Robomis

    rng = np.random.default_rng(1)
    for sub in ("images/training", "annotations/training"):
        (tmp_path / sub).mkdir(parents=True)
    for i in range(2):
        img = rng.integers(0, 256, (100, 120, 3), np.uint8)
        Image.fromarray(img).save(tmp_path / f"images/training/{i}.png")
        mask = (rng.uniform(size=(100, 120)) > 0.6).astype(np.uint8) * 255
        Image.fromarray(mask, "L").save(tmp_path / f"annotations/training/{i}.png")

    ds_native = Robomis(str(tmp_path), "training", imsize=56)
    ds_pil = Robomis(str(tmp_path), "training", imsize=56)
    ds_pil.use_native = False
    for i in range(2):
        img_n, mask_n, _ = ds_native[i]
        img_p, mask_p, _ = ds_pil[i]
        np.testing.assert_array_equal(mask_n, mask_p)
        np.testing.assert_array_equal(img_n, img_p)
