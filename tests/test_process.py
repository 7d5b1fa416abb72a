"""Offline converter round-trips on synthetic raw layouts."""

import os

import numpy as np
import pytest
from PIL import Image

from adaptersis_tpu.data.datasets import Robomis
from adaptersis_tpu.data.process.cholec8k import CLASS2GRAY, decode_watershed
from adaptersis_tpu.data.process.endovis2018 import rgb2id
from adaptersis_tpu.data.process.robustmis2019 import process as process_robustmis


def test_robustmis_converter_roundtrip(tmp_path):
    raw = tmp_path / "raw" / "Training" / "instrument"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    label = (rng.uniform(size=(32, 32)) > 0.5).astype(np.uint8) * 7  # instance ids
    Image.fromarray(img).save(raw / "001_img.png")
    Image.fromarray(label).save(raw / "001_label.png")

    out = tmp_path / "processed"
    entries = process_robustmis(str(tmp_path / "raw"), str(out), data_type="train")
    assert len(entries) == 1
    ds = Robomis(str(out), split="training")
    im, mask, idx = ds[0]
    assert im.shape == (32, 32, 3)
    np.testing.assert_array_equal(mask, (label > 0).astype(np.int32))


def test_cholec_watershed_decode():
    raw = np.zeros((4, 4), np.uint8)
    raw[0, 0] = CLASS2GRAY["grasper"]
    raw[1, 1] = CLASS2GRAY["liver"]
    out = decode_watershed(raw)
    assert out[0, 0] == 5 and out[1, 1] == 2 and out[2, 2] == 0


def test_rgb2id():
    c = np.zeros((1, 1, 3), np.uint8)
    c[0, 0] = [1, 2, 3]
    assert rgb2id(c)[0, 0] == 1 + 256 * 2 + 256 * 256 * 3
