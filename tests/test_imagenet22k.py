"""ImageNet22k tarball reader over a synthesized mini-corpus fixture
(dinov2/data/datasets/image_net_22k.py:70-300 semantics)."""

import gzip
import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from adaptersis_tpu.data.imagenet22k import ImageNet22k, build_cache


def _jpeg_bytes(seed, size=(8, 8)):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 256, size + (3,), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def _make_corpus(root, classes):
    """Per-class GNU tar + blocks/<class>.log with `block N: name` lines."""
    os.makedirs(os.path.join(root, "blocks"), exist_ok=True)
    originals = {}
    for class_id, members in classes.items():
        tar_path = os.path.join(root, f"{class_id}.tar")
        with tarfile.open(tar_path, "w", format=tarfile.GNU_FORMAT) as tf:
            for name, payload in members:
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
        # reconstruct the blocks log from the member header offsets
        lines = []
        with tarfile.open(tar_path) as tf:
            last_end = 0
            for m in tf:
                lines.append(f"block {m.offset // 512}: {m.name}")
                last_end = m.offset_data + ((m.size + 511) // 512) * 512
        lines.append(f"block {last_end // 512}: ** Block of NULs **")
        with open(os.path.join(root, "blocks", f"{class_id}.log"), "w") as f:
            f.write("\n".join(lines) + "\n")
        originals[class_id] = members
    return originals


def test_imagenet22k_reader_roundtrip(tmp_path):
    root = str(tmp_path / "in22k")
    jp = {f"s{i}": _jpeg_bytes(i) for i in range(5)}
    classes = {
        "n001": [("n001_0.JPEG", jp["s0"]), ("n001_1.JPEG", jp["s1"])],
        "n002": [("n002_0.JPEG", jp["s2"]),
                 # an in-place GZIPPED member (reference :211-216)
                 ("n002_1.JPEG", gzip.compress(jp["s3"])),
                 # the known-corrupt member must be skipped at cache build
                 ("n06470073_47249.JPEG", jp["s4"])],
    }
    _make_corpus(root, classes)

    ds = ImageNet22k(root)
    # 5 members − 1 corrupt = 4 entries, class ids sorted
    assert len(ds) == 4
    assert ds.find_class_id(0) == "n001" and ds.find_class_id(1) == "n002"
    np.testing.assert_array_equal(ds.get_targets(), [0, 0, 1, 1])

    # raw bytes round-trip exactly (tar pads with NULs; decoders ignore them)
    assert ds.get_image_data(0)[:len(jp["s0"])] == jp["s0"]
    assert ds.get_image_data(2)[:len(jp["s2"])] == jp["s2"]
    # gzipped member is transparently decompressed
    assert ds.get_image_data(3)[:len(jp["s3"])] == jp["s3"]

    img, target, idx = ds[1]
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    assert (target, idx) == (0, 1)
    want = np.asarray(Image.open(io.BytesIO(jp["s1"])).convert("RGB"))
    np.testing.assert_array_equal(img, want)

    # the npy caches were written and a second open reuses them (mmap'd)
    assert os.path.exists(os.path.join(root, "extra", "entries.npy"))
    ds2 = ImageNet22k(root, imsize=4)
    img2, _, _ = ds2[0]
    assert img2.shape == (4, 4, 3)


def test_imagenet22k_cache_is_structured(tmp_path):
    root = str(tmp_path / "mini")
    _make_corpus(root, {"n009": [("n009_0.JPEG", _jpeg_bytes(9))]})
    entries, ids = build_cache(root, str(tmp_path / "extra"))
    assert entries.dtype.names == ("class_index", "class_id", "start_offset",
                                   "end_offset", "filename")
    assert entries[0]["filename"] == "n009_0.JPEG"
    assert entries[0]["end_offset"] > entries[0]["start_offset"] >= 0
    assert list(ids) == ["n009"]
