"""File-backed end-to-end `train.py` integration test (VERDICT r4 weak #5).

Every seam is unit-tested elsewhere (native loader, datasets, augment, trainer,
checkpoint); this is the one test that binds them in ONE process the way a real
run does (reference: /root/reference/train.py:119-174 builds exactly this
pipeline every run): synthetic Robust-MIS-layout PNGs on disk
(images/<split>/*.png + annotations/<split>/ mode-'1' masks,
/root/reference/tools/dataset.py:127-167) → train.py main() through the native
C++ loader for an epoch → simulated preemption → checkpoint-resume →
--evaluate.
"""

import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
from PIL import Image

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

IMSIZE = 140  # vit_small/14 smoke geometry (10x10 token grid)


def _write_robomis(root: Path, n_train=16, n_val=2):
    # NB: the suite runs on an 8-device virtual mesh (conftest), so the global
    # train batch is batch_size_per_gpu × 8; n_train must cover ≥1 full batch
    # (drop_last) — n_val=2 < 8 exercises the padded-validation path instead.
    rng = np.random.default_rng(0)
    for split, n in (("training", n_train), ("validation", n_val)):
        (root / "images" / split).mkdir(parents=True)
        (root / "annotations" / split).mkdir(parents=True)
        for i in range(n):
            # non-square source frames exercise the resize path
            img = rng.integers(0, 256, (120, 160, 3), np.uint8)
            Image.fromarray(img).save(root / "images" / split / f"{i:03d}.png")
            mask = rng.uniform(size=(120, 160)) > 0.6
            # the reference stores masks as PIL mode '1' (dataset.py:146)
            Image.fromarray(mask).convert("1").save(
                root / "annotations" / split / f"{i:03d}.png")


def _args(data_path: str, out_dir: str, epochs: int, evaluate=False):
    import train as train_mod

    argv = ["--arch", "vit_small", "--patch_size", "14",
            "--imsize", str(IMSIZE), "--dataset", "robomis",
            "--data_path", data_path, "--output_dir", out_dir,
            "--epochs", str(epochs), "--batch_size_per_gpu", "1",
            "--num_workers", "0", "--seed", "0", "--platform", "cpu"]
    if evaluate:
        argv.append("--evaluate")
    return train_mod.get_args_parser().parse_args(argv), train_mod


@pytest.mark.slow
def test_train_py_file_backed_epoch_resume_evaluate(tmp_path, monkeypatch,
                                                    capsys):
    data = tmp_path / "robomis"
    out = tmp_path / "out"
    out.mkdir()
    _write_robomis(data)

    # spy on the native fast path: the run must actually go through the C++
    # loader for the images (masks may legitimately fall back to PIL if the
    # stored format is lossy-for-labels — not the case for mode-'1' → gray)
    from adaptersis_tpu.data import native

    assert native.available(), "native runtime failed to build"
    calls = {"n": 0}
    real = native.load_image

    def spy(*a, **kw):
        out_ = real(*a, **kw)
        if out_ is not None:
            calls["n"] += 1
        return out_

    monkeypatch.setattr(native, "load_image", spy)

    # ---- epoch 0 of 2, then simulated SLURM preemption ----
    monkeypatch.setenv("ASN_STOP_AFTER_EPOCHS", "1")
    args, train_mod = _args(str(data), str(out), epochs=2)
    train_mod.train_seg(args)
    assert calls["n"] > 0, "native loader was never used"
    log = (out / "log.txt").read_text().strip().splitlines()
    assert len(log) == 1 and json.loads(log[0])["epoch"] == 0

    # ---- requeue: same argv, resumes from the checkpoint and completes ----
    monkeypatch.delenv("ASN_STOP_AFTER_EPOCHS")
    args, _ = _args(str(data), str(out), epochs=2)
    train_mod.train_seg(args)
    text = capsys.readouterr().out
    assert "resumed from epoch 1" in text
    log = [json.loads(ln) for ln in
           (out / "log.txt").read_text().strip().splitlines()]
    assert [rec["epoch"] for rec in log] == [0, 1]
    for rec in log:
        for k in ("train_loss", "test_dice", "test_acc1"):
            assert k in rec and np.isfinite(rec[k]), (k, rec)

    # ---- --evaluate path on the final checkpoint ----
    args, _ = _args(str(data), str(out), epochs=2, evaluate=True)
    train_mod.train_seg(args)
    text = capsys.readouterr().out
    assert "Accuracy of the network on the 2 test images" in text
