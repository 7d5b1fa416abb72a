"""Robust-MIS 2019 converter (reference tools/process_robustmis2019.py).

Raw layout: <root>/{Training,Testing}/..._img.png + ..._label.png; binary
instrument mask = label > 0 (:42-48). DATA_TYPE env selects the split (:28-32).
Output: <out>/images/<split>/*.png + <out>/annotations/<split>/*.png (the Robomis
dataset layout, tools/dataset.py:127-167).
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np
from PIL import Image

from .common import read_mask_gray, write_index, write_mask

SPLIT_DIRS = {"train": "Training", "test": "Testing"}
SPLIT_OUT = {"train": "training", "test": "validation"}


def process(root_dir: str, out_dir: str, data_type: str | None = None):
    data_type = data_type or os.getenv("DATA_TYPE", "train")
    image_dir = os.path.join(root_dir, SPLIT_DIRS[data_type])
    out_split = SPLIT_OUT[data_type]
    entries = []
    for image_path in sorted(glob.glob(os.path.join(image_dir, "**", "*_img.png"),
                                       recursive=True)):
        mask = read_mask_gray(image_path.replace("_img.png", "_label.png"))
        binary = (mask > 0).astype(np.uint8)
        name = os.path.relpath(image_path, image_dir).replace(os.sep, "_")
        name = name.replace("_img.png", ".png")
        img_out = os.path.join(out_dir, "images", out_split, name)
        os.makedirs(os.path.dirname(img_out), exist_ok=True)
        Image.open(image_path).convert("RGB").save(img_out)
        mask_out = os.path.join(out_dir, "annotations", out_split, name)
        write_mask(mask_out, binary)
        entries.append({"img_path": img_out, "mask_path": mask_out})
    write_index(os.path.join(out_dir, f"index_{out_split}.json"), entries)
    return entries


if __name__ == "__main__":
    process(sys.argv[1], sys.argv[2])
