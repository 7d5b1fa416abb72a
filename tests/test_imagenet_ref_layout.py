"""Reference-layout ImageNet reader (dinov2/data/datasets/image_net.py:55-305):
entries/class-ids/class-names npy caches over a standard train/val tree, split
enum path scheme, and the dataset-string spec."""

import numpy as np
import pytest
from PIL import Image

from adaptersis_tpu.data import ImageNet, ImageNetSplit
from adaptersis_tpu.data.loaders import make_dataset

CLASSES = [("n01440764", "tench"), ("n01443537", "goldfish"),
           ("n01484850", "great white shark")]


@pytest.fixture()
def prepared_tree(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "imagenet"
    extra = tmp_path / "extra"
    root.mkdir()
    (root / "labels.txt").write_text(
        "".join(f"{cid},{name}\n" for cid, name in CLASSES))
    # train: <root>/train/<class_id>/<class_id>_<actual_index>.JPEG
    for ci, (cid, _) in enumerate(CLASSES):
        d = root / "train" / cid
        d.mkdir(parents=True)
        for j in range(2):
            img = rng.integers(0, 256, (24, 24, 3), np.uint8)
            Image.fromarray(img).save(d / f"{cid}_{ci * 10 + j}.JPEG")
    # val: <root>/val/<class_id>/ILSVRC2012_val_<idx:08d>.JPEG
    k = 1
    for cid, _ in CLASSES[:2]:
        d = root / "val" / cid
        d.mkdir(parents=True)
        img = rng.integers(0, 256, (24, 24, 3), np.uint8)
        Image.fromarray(img).save(d / f"ILSVRC2012_val_{k:08d}.JPEG")
        k += 1
    return str(root), str(extra)


def test_dump_and_read_train(prepared_tree):
    root, extra = prepared_tree
    ds = ImageNet(split=ImageNetSplit.TRAIN, root=root, extra=extra)
    ds.dump_extra()

    ds2 = ImageNet(split=ImageNetSplit.TRAIN, root=root, extra=extra, imsize=16)
    assert len(ds2) == 6
    # class indices follow sorted class-dir order (ImageFolder semantics)
    assert list(ds2.get_targets()) == [0, 0, 1, 1, 2, 2]
    assert ds2.find_class_id(1) == "n01443537"
    assert ds2.find_class_name(2) == "great white shark"
    assert ds2.get_class_id(0) == "n01440764"
    img, target, idx = ds2[3]
    assert img.shape == (16, 16, 3) and target == 1 and idx == 3
    # raw bytes round-trip through the actual_index path reconstruction
    assert ds2.get_image_data(0)[:2] == b"\xff\xd8"  # JPEG magic


def test_dump_and_read_val(prepared_tree):
    root, extra = prepared_tree
    ds = ImageNet(split=ImageNetSplit.VAL, root=root, extra=extra)
    ds.dump_extra()
    ds = ImageNet(split=ImageNetSplit.VAL, root=root, extra=extra)
    assert len(ds) == 2
    assert ds.get_image_relpath(1).endswith("ILSVRC2012_val_00000002.JPEG")
    img, target, _ = ds[0]
    assert img.shape == (24, 24, 3) and target == 0


def test_dataset_spec_string(prepared_tree):
    root, extra = prepared_tree
    ImageNet(split=ImageNetSplit.TRAIN, root=root, extra=extra).dump_extra()
    ds = make_dataset(f"ImageNet:split=TRAIN:root={root}:extra={extra}", imsize=16)
    assert isinstance(ds, ImageNet) and len(ds) == 6


def test_split_enum_matches_reference_scheme():
    s = ImageNetSplit.TRAIN
    assert s.length == 1_281_167
    assert s.get_image_relpath(7, "n123") == "train/n123/n123_7.JPEG"
    assert ImageNetSplit.VAL.get_image_relpath(3, "n1") == \
        "val/n1/ILSVRC2012_val_00000003.JPEG"
    assert s.parse_image_relpath("train/n123/n123_7.JPEG") == ("n123", 7)
