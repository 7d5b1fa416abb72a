"""Dataset-string registry + loader factory (reference: dinov2/data/loaders.py).

  * make_dataset("ImageNet:split=TRAIN:root=/path") — string spec → dataset
    (:44-64)
  * SamplerType enum + make_data_loader (:20-26, 166-222)
  * DatasetWithEnumeratedTargets (dinov2/data/adapters.py:11-28)
"""

from __future__ import annotations

import enum
from typing import Any, Optional

from .datasets import DATASETS, SegDataset
from .imagenet import ImageFolderDataset, ImageNet, ImageNetSplit
from .loader import DataLoader
from .samplers import EpochSampler, InfiniteSampler, ShardedInfiniteSampler


class SamplerType(enum.Enum):
    DISTRIBUTED = 0
    EPOCH = 1
    INFINITE = 2
    SHARDED_INFINITE = 3
    SHARDED_INFINITE_NEW = 4


def _parse_spec(spec: str):
    parts = spec.split(":")
    name = parts[0]
    kwargs = {}
    for p in parts[1:]:
        k, _, v = p.partition("=")
        kwargs[k.lower()] = v
    return name, kwargs


def make_dataset(dataset_str: str, imsize: Optional[int] = None, **extra):
    """'ImageNet:split=TRAIN:root=/x' or any of the seg datasets
    ('robomis:split=training:root=/x')."""
    name, kw = _parse_spec(dataset_str)
    split = kw.pop("split", "TRAIN")
    root = kw.pop("root", kw.pop("path", ""))
    lname = name.lower()
    if lname == "imagenet" and (kw.get("extra") or extra.get("extra")):
        # reference prepared layout (dinov2/data/loaders.py:44-64 spec syntax
        # "ImageNet:split=TRAIN:root=…:extra=…")
        return ImageNet(split=ImageNetSplit[split.upper()], root=root,
                        extra=kw.get("extra") or extra.get("extra"),
                        imsize=imsize)
    if lname in ("imagenet", "imagenet22k", "imagefolder"):
        return ImageFolderDataset(root, split=split.lower(), imsize=imsize)
    if lname in DATASETS:
        split_map = {"train": "training", "val": "validation", "test": "validation"}
        return DATASETS[lname](root, split=split_map.get(split.lower(), split), imsize=imsize)
    raise ValueError(f'unknown dataset spec "{dataset_str}"')


def make_sampler(sampler_type: SamplerType, size: int, shuffle: bool = True,
                 seed: int = 0, rank: int = 0, world_size: int = 1, advance: int = 0):
    if sampler_type in (SamplerType.DISTRIBUTED, SamplerType.EPOCH):
        return EpochSampler(size, shuffle=shuffle, seed=seed, rank=rank, world_size=world_size)
    if sampler_type == SamplerType.INFINITE:
        return InfiniteSampler(size, shuffle=shuffle, seed=seed, rank=rank,
                               world_size=world_size, advance=advance)
    return ShardedInfiniteSampler(size, shuffle=shuffle, seed=seed, rank=rank,
                                  world_size=world_size, advance=advance)


def make_data_loader(dataset, batch_size: int, num_workers: int = 4,
                     sampler_type: SamplerType = SamplerType.EPOCH, shuffle: bool = True,
                     seed: int = 0, rank: int = 0, world_size: int = 1,
                     drop_last: bool = True, advance: int = 0) -> DataLoader:
    sampler = make_sampler(sampler_type, len(dataset), shuffle, seed, rank, world_size, advance)
    return DataLoader(dataset, sampler=sampler, batch_size=batch_size,
                      num_workers=num_workers, drop_last=drop_last)


class DatasetWithEnumeratedTargets:
    """Wrap targets as (index, target) for distributed feature extraction
    (dinov2/data/adapters.py:11-28)."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, index: int):
        img, target, _ = self._dataset[index]
        return img, (index, target), index
