"""Shared helpers for the offline dataset converters (reference tools/process_*.py).

Each converter reads a raw dataset release and writes the images/annotations
layout the framework's dataset classes consume (label-id PNG masks), plus a JSON
index. The reference scripts write per-class 0/255 masks and were partly
incomplete (process_robustmis2019.py never calls get_one_sample, SURVEY §2.4);
these emit label-id masks directly, which is what tools/dataset.py actually reads.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np
from PIL import Image


def write_mask(path: str, mask: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(mask.astype(np.uint8), mode="L").save(path)


def write_index(path: str, entries: List[Dict[str, str]]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(entries, f, indent=2)


def read_image(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.asarray(Image.open(f).convert("RGB"))


def read_mask_gray(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        img = Image.open(f)
        img.load()
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[:, :, 0]  # reference converters take channel 0 of cv2.imread
    return arr
