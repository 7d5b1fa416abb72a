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


# ---- reference-layout ImageNet (dinov2/data/datasets/image_net.py:21-305) ----

from enum import Enum


class ImageNetSplit(Enum):
    """Split enum with the reference's path scheme (image_net.py:21-52)."""

    TRAIN = "train"
    VAL = "val"
    TEST = "test"

    @property
    def length(self) -> int:
        return {ImageNetSplit.TRAIN: 1_281_167, ImageNetSplit.VAL: 50_000,
                ImageNetSplit.TEST: 100_000}[self]

    def get_dirname(self, class_id: Optional[str] = None) -> str:
        return self.value if class_id is None else os.path.join(self.value, class_id)

    def get_image_relpath(self, actual_index: int, class_id: Optional[str] = None) -> str:
        dirname = self.get_dirname(class_id)
        if self == ImageNetSplit.TRAIN:
            basename = f"{class_id}_{actual_index}"
        else:
            basename = f"ILSVRC2012_{self.value}_{actual_index:08d}"
        return os.path.join(dirname, basename + ".JPEG")

    def parse_image_relpath(self, image_relpath: str):
        assert self != ImageNetSplit.TEST
        dirname, filename = os.path.split(image_relpath)
        class_id = os.path.split(dirname)[-1]
        basename, _ = os.path.splitext(filename)
        return class_id, int(basename.split("_")[-1])


class ImageNet:
    """The reference's prepared-ImageNet reader (image_net.py:55-305): mmap'd
    `entries-<SPLIT>.npy` structured array + `class-ids/names-<SPLIT>.npy`
    caches in an `extra` dir over the standard train/val tree. `dump_extra()`
    builds the caches (torchvision-ImageFolder enumeration order: sorted class
    dirs, sorted files). TEST split has no labels (class_index == u32 −1).

    Delta (on purpose): `__len__` returns the entries count without asserting
    the full-ImageNet split length (image_net.py:166-169 hard-codes 1,281,167),
    so prepared subsets remain loadable/testable."""

    Split = ImageNetSplit

    def __init__(self, *, split: ImageNetSplit, root: str, extra: str,
                 imsize: Optional[int] = None):
        self.root = root
        self._extra_root = extra
        self._split = split
        self.imsize = imsize
        self._entries = None
        self._class_ids = None
        self._class_names = None

    @property
    def split(self) -> ImageNetSplit:
        return self._split

    # ---- extra caches ----

    def _extra_path(self, name: str) -> str:
        return os.path.join(self._extra_root, name)

    def _load_extra(self, name: str) -> np.ndarray:
        return np.load(self._extra_path(name), mmap_mode="r")

    def _save_extra(self, arr: np.ndarray, name: str) -> None:
        os.makedirs(self._extra_root, exist_ok=True)
        np.save(self._extra_path(name), arr)

    @property
    def _entries_name(self) -> str:
        return f"entries-{self._split.value.upper()}.npy"

    def _get_entries(self) -> np.ndarray:
        if self._entries is None:
            self._entries = self._load_extra(self._entries_name)
        return self._entries

    def _get_class_ids(self) -> np.ndarray:
        assert self._split != ImageNetSplit.TEST, "Class IDs are not available in TEST split"
        if self._class_ids is None:
            self._class_ids = self._load_extra(f"class-ids-{self._split.value.upper()}.npy")
        return self._class_ids

    def _get_class_names(self) -> np.ndarray:
        assert self._split != ImageNetSplit.TEST, "Class names are not available in TEST split"
        if self._class_names is None:
            self._class_names = self._load_extra(f"class-names-{self._split.value.upper()}.npy")
        return self._class_names

    # ---- reference accessor API ----

    def find_class_id(self, class_index: int) -> str:
        return str(self._get_class_ids()[class_index])

    def find_class_name(self, class_index: int) -> str:
        return str(self._get_class_names()[class_index])

    def get_image_relpath(self, index: int) -> str:
        entries = self._get_entries()
        actual_index = int(entries[index]["actual_index"])
        class_id = self.get_class_id(index)
        return self._split.get_image_relpath(actual_index, class_id)

    def get_image_data(self, index: int) -> bytes:
        with open(os.path.join(self.root, self.get_image_relpath(index)), "rb") as f:
            return f.read()

    def get_target(self, index: int) -> Optional[int]:
        if self._split == ImageNetSplit.TEST:
            return None
        return int(self._get_entries()[index]["class_index"])

    def get_targets(self) -> Optional[np.ndarray]:
        if self._split == ImageNetSplit.TEST:
            return None
        return self._get_entries()["class_index"]

    def get_class_id(self, index: int) -> Optional[str]:
        entries = self._get_entries()
        return None if self._split == ImageNetSplit.TEST else str(entries[index]["class_id"])

    def get_class_name(self, index: int) -> Optional[str]:
        entries = self._get_entries()
        return None if self._split == ImageNetSplit.TEST else str(entries[index]["class_name"])

    def __len__(self) -> int:
        return len(self._get_entries())

    def __getitem__(self, index: int):
        import io

        img = Image.open(io.BytesIO(self.get_image_data(index))).convert("RGB")
        if self.imsize is not None:
            img = img.resize((self.imsize, self.imsize), Image.BILINEAR)
        t = self.get_target(index)
        return np.asarray(img, np.uint8), (-1 if t is None else t), index

    # ---- cache builders (image_net.py:186-305) ----

    def _load_labels(self):
        """labels.txt: 'class_id,class_name' CSV rows (image_net.py:172-186)."""
        import csv

        path = os.path.join(self.root, "labels.txt")
        try:
            with open(path) as f:
                return [(r[0], r[1]) for r in csv.reader(f)]
        except OSError as e:
            raise RuntimeError(f'can not read labels file "{path}"') from e

    def _enumerate_samples(self):
        """Sorted-class-dir, sorted-file enumeration — torchvision ImageFolder
        order, which the reference relies on for class_index assignment."""
        split_dir = os.path.join(self.root, self._split.get_dirname())
        classes = sorted(d for d in os.listdir(split_dir)
                         if os.path.isdir(os.path.join(split_dir, d)))
        for class_index, class_id in enumerate(classes):
            cdir = os.path.join(split_dir, class_id)
            for fname in sorted(os.listdir(cdir)):
                yield os.path.join(self._split.value, class_id, fname), class_index

    def dump_extra(self) -> None:
        split = self._split
        if split == ImageNetSplit.TEST:
            n = split.length
            dtype = np.dtype([("actual_index", "<u4"), ("class_index", "<u4"),
                              ("class_id", "U1"), ("class_name", "U1")])
            entries = np.empty(n, dtype=dtype)
            for i in range(n):
                entries[i] = (i + 1, np.uint32(-1), "", "")
            self._save_extra(entries, self._entries_name)
            return
        labels = self._load_labels()
        class_names = dict(labels)
        samples = list(self._enumerate_samples())
        max_id = max((len(c) for c, _ in labels), default=1)
        max_name = max((len(n) for _, n in labels), default=1)
        dtype = np.dtype([("actual_index", "<u4"), ("class_index", "<u4"),
                          ("class_id", f"U{max_id}"), ("class_name", f"U{max_name}")])
        entries = np.empty(len(samples), dtype=dtype)
        for i, (relpath, class_index) in enumerate(samples):
            class_id, actual_index = split.parse_image_relpath(relpath)
            entries[i] = (actual_index, class_index, class_id, class_names[class_id])
        self._save_extra(entries, self._entries_name)

        max_index = int(entries["class_index"].max())
        class_ids = np.empty(max_index + 1, dtype=f"U{max_id}")
        names = np.empty(max_index + 1, dtype=f"U{max_name}")
        for e in entries:
            class_ids[e["class_index"]] = e["class_id"]
            names[e["class_index"]] = e["class_name"]
        self._save_extra(class_ids, f"class-ids-{split.value.upper()}.npy")
        self._save_extra(names, f"class-names-{split.value.upper()}.npy")
