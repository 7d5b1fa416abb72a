"""Registry, hub, colormaps, loaders, launch, imagefolder."""

import os

import numpy as np
import pytest
from PIL import Image

from adaptersis_tpu.data.loaders import (DatasetWithEnumeratedTargets, SamplerType,
                                         make_data_loader, make_dataset)
from adaptersis_tpu.hub import DINOV2_URLS, build_model_for_eval
from adaptersis_tpu.parallel.launch import detect_cluster, write_sbatch
from adaptersis_tpu.utils.colormaps import colorize, get_palette


def test_hub_factories():
    m, p = build_model_for_eval("dinov2_vitb14")
    assert m.embed_dim == 768 and p is None
    m2, _ = build_model_for_eval("vit_small")
    assert m2.embed_dim == 384
    assert len(DINOV2_URLS) == 8
    with pytest.raises(ValueError):
        build_model_for_eval("dinov2_vitXXL")


def test_dataset_registry_and_imagefolder(tmp_path):
    for cls_name, val in (("cat", 10), ("dog", 200)):
        d = tmp_path / "train" / cls_name
        d.mkdir(parents=True)
        Image.fromarray(np.full((16, 16, 3), val, np.uint8)).save(d / "a.png")
    ds = make_dataset(f"ImageNet:split=train:root={tmp_path}", imsize=8)
    assert len(ds) == 2
    img, label, idx = ds[0]
    assert img.shape == (8, 8, 3) and label in (0, 1)
    # cache file created → reopen uses it
    assert os.path.exists(tmp_path / "_entries_train.npy")
    ds2 = make_dataset(f"ImageNet:split=train:root={tmp_path}", imsize=8)
    assert len(ds2) == 2

    wrapped = DatasetWithEnumeratedTargets(ds)
    _, (i, t), _ = wrapped[1]
    assert i == 1 and t == ds.get_target(1)

    loader = make_data_loader(ds, batch_size=2, num_workers=1,
                              sampler_type=SamplerType.EPOCH)
    imgs, labels, idxs = next(iter(loader))
    assert imgs.shape == (2, 8, 8, 3)

    with pytest.raises(ValueError):
        make_dataset("NopeNet:split=TRAIN")


def test_colormaps():
    pal = get_palette("ade20k", 150)
    assert pal.shape == (150, 3) and pal.dtype == np.uint8
    assert len(np.unique(pal, axis=0)) > 140  # near-unique colors
    voc = get_palette("voc", 21)
    assert tuple(voc[1]) == (128, 0, 0)
    m = np.zeros((4, 4), np.int32)
    m[2:, 2:] = 3
    rgb = colorize(m)
    assert rgb.shape == (4, 4, 3)


def test_launch_sbatch(tmp_path):
    p = write_sbatch(str(tmp_path / "j.sbatch"), ["train.py", "--imsize", "588"],
                     nodes=4, partition="tpu")
    body = open(p).read()
    assert "--nodes=4" in body and "--requeue" in body and "train.py --imsize 588" in body
    assert detect_cluster() in ("slurm", "tpu-pod", "local")
