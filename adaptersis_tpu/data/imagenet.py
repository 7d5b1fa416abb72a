"""ImageNet-style classification datasets
(reference: dinov2/data/datasets/image_net.py + image_net_22k.py).

The reference builds numpy-mmap entry/class caches over the raw tarballs
(:55-305). Here: a directory-per-class ImageFolder layout with an npy index cache
built on first touch — same O(1) resume-able indexing, no torch.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFolderDataset:
    """<root>/<split>/<class_name>/<image> layout; returns (img_uint8 HWC,
    class_id, index). An `_entries_<split>.npy` cache makes reopening O(1)
    (the reference's mmap entries cache, image_net.py:120-180)."""

    def __init__(self, root: str, split: str = "train", imsize: Optional[int] = None):
        self.root = root
        self.split = split
        self.imsize = imsize
        cache = os.path.join(root, f"_entries_{split}.npy")
        if os.path.exists(cache):
            blob = np.load(cache, allow_pickle=True).item()
            self.paths, self.labels, self.classes = blob["paths"], blob["labels"], blob["classes"]
        else:
            split_dir = os.path.join(root, split)
            self.classes = sorted(
                d for d in os.listdir(split_dir)
                if os.path.isdir(os.path.join(split_dir, d))
            ) if os.path.isdir(split_dir) else []
            paths, labels = [], []
            for cid, cname in enumerate(self.classes):
                cdir = os.path.join(split_dir, cname)
                for f in sorted(os.listdir(cdir)):
                    if f.lower().endswith(_EXTS):
                        paths.append(os.path.join(cdir, f))
                        labels.append(cid)
            self.paths = np.asarray(paths)
            self.labels = np.asarray(labels, np.int32)
            try:
                np.save(cache, {"paths": self.paths, "labels": self.labels,
                                "classes": self.classes}, allow_pickle=True)
            except OSError:
                pass  # read-only roots are fine; just skip the cache

    def __len__(self) -> int:
        return len(self.paths)

    def get_target(self, index: int) -> int:
        return int(self.labels[index])

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int, int]:
        with open(self.paths[index], "rb") as f:
            img = Image.open(f).convert("RGB")
        if self.imsize is not None:
            img = img.resize((self.imsize, self.imsize), Image.BILINEAR)
        return np.asarray(img, np.uint8), int(self.labels[index]), index
