"""Dataset classes for the five endoscopy datasets + a synthetic dataset.

Parity targets (reference: /root/reference/tools/dataset.py). All datasets return
(image_uint8 HWC, mask int32 HW, index) as numpy arrays; normalization (/255) and
augmentation happen ON DEVICE inside the jitted train step (TPU-first delta — the
reference runs albumentations on CPU workers and returns float CHW tensors).

Mask decode rules preserved exactly:
  * EndoVis2017 (:7-71): binary = mask > 0; 'instruments' = mask / 32 label decode
  * EndoVis2018 (:74-123): seq_{1..15} train, seq_{1..4} test
  * Robomis (:127-167): images/<split>/*.png + annotations/<split>/<same name>,
    mask = point(x > 0, mode='1')
  * AutoLaparo (:172-223): the reference class is broken (`dataset_num` undefined,
    SURVEY §2.12 #5) — implemented here per the obvious intent (imgs/masks dirs)
  * resize to imsize: PIL BILINEAR for images / NEAREST for masks, BEFORE the
    transform (:148-150)
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


class SegDataset:
    """Minimal indexable dataset protocol: __len__, __getitem__ → (img, mask, idx).

    When the native C++ runtime (runtime/image_io.cc) is built, decode + resize
    run there, BIT-EXACT vs PIL for both bilinear images and nearest masks
    (golden-tested in tests/test_native_loader.py); otherwise the PIL path
    reproduces the reference exactly (tools/dataset.py:139-150). The native
    path refuses lossy-for-labels mask formats (16-bit gray, true-RGB) and
    falls back to PIL for those files.
    """

    img_files: List[str]
    mask_files: List[str]
    imsize: Optional[int] = None
    use_native: bool = True

    def __len__(self) -> int:
        return len(self.img_files)

    def _decode_mask(self, mask: Image.Image) -> np.ndarray:
        raise NotImplementedError

    def _decode_mask_array(self, mask: np.ndarray) -> np.ndarray:
        """Array equivalent of _decode_mask for the native path."""
        raise NotImplementedError

    def _native_item(self, index: int):
        from . import native

        if not (self.use_native and self.imsize is not None and native.available()):
            return None
        size = (self.imsize, self.imsize)
        img = native.load_image(self.img_files[index], size, "rgb", "bilinear")
        raw = native.load_image(self.mask_files[index], size, "gray", "nearest")
        if img is None or raw is None:
            return None
        try:
            mask = self._decode_mask_array(raw)
        except NotImplementedError:
            return None
        return img, mask.astype(np.int32), index

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray, int]:
        fast = self._native_item(index)
        if fast is not None:
            return fast
        with open(self.img_files[index], "rb") as f:
            img = Image.open(f).convert("RGB")
        with open(self.mask_files[index], "rb") as f:
            mask_img = Image.open(f)
            mask_img.load()
        if self.imsize is not None:
            img = img.resize((self.imsize, self.imsize), resample=Image.BILINEAR)
            mask_img = mask_img.resize((self.imsize, self.imsize), resample=Image.NEAREST)
        mask = self._decode_mask(mask_img)
        return np.asarray(img, np.uint8), mask.astype(np.int32), index


class Robomis(SegDataset):
    """Robust-MIS 2019 binary layout (tools/dataset.py:127-167)."""

    def __init__(self, dir_main: str, split: str, imsize: Optional[int] = None):
        self.imsize = imsize
        self.img_files = sorted(glob.glob(os.path.join(dir_main, "images", split, "*.png")))
        self.mask_files = [
            os.path.join(dir_main, "annotations", split, os.path.basename(p)) for p in self.img_files
        ]

    def _decode_mask(self, mask: Image.Image) -> np.ndarray:
        return (np.asarray(mask) > 0).astype(np.int32)

    def _decode_mask_array(self, mask: np.ndarray) -> np.ndarray:
        return (mask > 0).astype(np.int32)


class EndoVis2017(SegDataset):
    """instrument_dataset_{1..8} train / {1..10} test; binary or /32 instrument
    decode (tools/dataset.py:7-71)."""

    def __init__(self, dir_main: str, split: str, imsize: Optional[int] = None,
                 problem_type: str = "binary"):
        self.imsize = imsize
        self.problem_type = problem_type
        n = 8 if split.lower() in ("training", "train") else 10
        sub = "train" if split.lower() in ("training", "train") else "test"
        self.img_files, self.mask_files = [], []
        for i in range(1, n + 1):
            root = os.path.join(dir_main, sub, f"instrument_dataset_{i}")
            imgs = sorted(glob.glob(os.path.join(root, "images", "*")))
            self.img_files += imgs
            mdir = "binary_masks" if problem_type == "binary" else "instruments_masks"
            self.mask_files += [
                os.path.join(root, mdir, os.path.basename(p)) for p in imgs
            ]

    def _decode_mask(self, mask: Image.Image) -> np.ndarray:
        return self._decode_mask_array(np.asarray(mask))

    def _decode_mask_array(self, m: np.ndarray) -> np.ndarray:
        if self.problem_type == "binary":
            return (m > 0).astype(np.int32)
        return (m // 32).astype(np.int32)  # factor-32 label decode (:50-51)


class EndoVis2018(SegDataset):
    """seq_{1..15} train / seq_{1..4} test (tools/dataset.py:74-123)."""

    def __init__(self, dir_main: str, split: str, imsize: Optional[int] = None):
        self.imsize = imsize
        seqs = range(1, 16) if split.lower() in ("training", "train") else range(1, 5)
        sub = "train" if split.lower() in ("training", "train") else "test"
        self.img_files, self.mask_files = [], []
        for i in seqs:
            root = os.path.join(dir_main, sub, f"seq_{i}")
            imgs = sorted(glob.glob(os.path.join(root, "left_frames", "*")))
            self.img_files += imgs
            self.mask_files += [os.path.join(root, "labels", os.path.basename(p)) for p in imgs]

    def _decode_mask(self, mask: Image.Image) -> np.ndarray:
        return np.asarray(mask.convert("L"), np.int32)


class CholecSeg8k(SegDataset):
    """CholecSeg8k processed layout: images/<split>, annotations/<split>
    (tools/process_cholec8k.py output)."""

    def _decode_mask_array(self, m: np.ndarray) -> np.ndarray:
        return m.astype(np.int32)

    def __init__(self, dir_main: str, split: str, imsize: Optional[int] = None):
        self.imsize = imsize
        self.img_files = sorted(glob.glob(os.path.join(dir_main, "images", split, "*.png")))
        self.mask_files = [
            os.path.join(dir_main, "annotations", split, os.path.basename(p)) for p in self.img_files
        ]

    def _decode_mask(self, mask: Image.Image) -> np.ndarray:
        return np.asarray(mask.convert("L"), np.int32)


class AutoLaparo(SegDataset):
    """AutoLaparo Task 3 layout: imgs/ and masks/ with train/val/test splits.
    The reference class is unrunnable (tools/dataset.py:186) — this follows its
    evident intent."""

    def _decode_mask_array(self, m: np.ndarray) -> np.ndarray:
        return m.astype(np.int32)

    def __init__(self, dir_main: str, split: str, imsize: Optional[int] = None):
        self.imsize = imsize
        self.img_files = sorted(glob.glob(os.path.join(dir_main, "imgs", split, "*")))
        self.mask_files = [
            os.path.join(dir_main, "masks", split, os.path.basename(p)) for p in self.img_files
        ]

    def _decode_mask(self, mask: Image.Image) -> np.ndarray:
        return np.asarray(mask.convert("L"), np.int32)


class SyntheticSeg(SegDataset):
    """Deterministic synthetic frames+masks (SURVEY §4 'FakeDataset'): random
    ellipses as 'instruments' on structured noise. No file I/O; fully seeded."""

    def __init__(self, n: int = 64, imsize: int = 140, num_classes: int = 2, seed: int = 0):
        self.n = n
        self.imsize = imsize
        self.num_classes = num_classes
        self.seed = seed
        self.img_files = [str(i) for i in range(n)]  # len() support

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray, int]:
        rng = np.random.default_rng(self.seed * 100003 + index)
        s = self.imsize
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        img = np.stack(
            [np.sin(6 * np.pi * (xx + rng.uniform())) * 0.25 + 0.5 for _ in range(3)], -1
        )
        mask = np.zeros((s, s), np.int32)
        for c in range(1, self.num_classes):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            rx, ry = rng.uniform(0.05, 0.25, 2)
            ell = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1
            mask[ell] = c
            img[ell] = img[ell] * 0.5 + np.asarray([0.8, 0.2 * c, 0.1])[None] * 0.5
        return (img * 255).clip(0, 255).astype(np.uint8), mask, index


DATASETS = {
    "robomis": Robomis,
    "endovis2017": EndoVis2017,
    "endovis2018": EndoVis2018,
    "cholecseg8k": CholecSeg8k,
    "autolaparo": AutoLaparo,
    "synthetic": SyntheticSeg,
}
