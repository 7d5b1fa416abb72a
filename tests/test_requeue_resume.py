"""Preemption-requeue ≡ resume, as a tested behavior (VERDICT r3 #9).

The reference gets mid-training SLURM requeue via submitit checkpoint()
(/root/reference/dinov2/run/submit.py:92-123, run/train/train.py:27-32): the
job is killed, re-submitted with IDENTICAL args, and continues from the last
checkpoint. These tests simulate the kill (env-var hooks in train.py /
pretrain.py), re-run the same entry point with the same args, and assert the
resumed trajectory is BIT-IDENTICAL to an uninterrupted run — sampler
position, optimizer state, per-step rng and schedules all line up.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(script, args, extra_env=None, timeout=900):
    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "PYTHONPATH": str(REPO),
        "JAX_CACHE_DIR": "/tmp/jax_cache_cpu_tests",
        **(extra_env or {}),
    }
    r = subprocess.run([sys.executable, str(REPO / script), *args],
                       env=env, capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"{script} {args}\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    return r.stdout


def _load_ckpt(path):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(str(path))


def _assert_tree_equal(a, b):
    import jax

    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_train_requeue_resume_bit_identical(tmp_path):
    """train.py: kill after epoch 1 of 2, re-run with identical args, final
    checkpoint must equal the uninterrupted run's (epoch-keyed resume,
    reference semantics: restart_from_checkpoint utils.py:152-184)."""
    args = ["--platform", "cpu", "--synthetic", "--arch", "vit_test",
            "--patch_size", "14", "--imsize", "56", "--epochs", "2",
            "--batch_size_per_gpu", "2", "--val_freq", "100", "--seed", "3"]

    out_a = tmp_path / "straight"
    out_b = tmp_path / "requeued"
    _run("train.py", args + ["--output_dir", str(out_a)])
    # run B: preempted after 1 epoch, then requeued with the SAME args
    _run("train.py", args + ["--output_dir", str(out_b)],
         extra_env={"ASN_STOP_AFTER_EPOCHS": "1"})
    _run("train.py", args + ["--output_dir", str(out_b)])

    a = _load_ckpt(out_a / "checkpoint")
    b = _load_ckpt(out_b / "checkpoint")
    assert int(np.asarray(b["epoch"])) == 2
    _assert_tree_equal(a, b)


@pytest.mark.slow
def test_pretrain_requeue_resume_bit_identical(tmp_path):
    """pretrain.py: kill MID-epoch (iteration 4 of 6, last checkpoint at 3),
    requeue with identical args. The resumed run must advance the
    ShardedInfiniteSampler by the restored step, re-derive the per-iteration
    rng/mask seeds, and land on a bit-identical model_final."""
    args = ["--platform", "cpu", "--synthetic", "--arch", "vit_test",
            "--patch_size", "14", "--global_crops_size", "56",
            "--local_crops_size", "28", "--local_crops_number", "2",
            "--batch_size_per_gpu", "2", "--epochs", "2",
            "--steps_per_epoch", "3", "--saveckp_freq", "1",
            "--dino_out_dim", "128", "--warmup_epochs", "0", "--seed", "5"]

    out_a = tmp_path / "straight"
    out_b = tmp_path / "requeued"
    _run("pretrain.py", args + ["--output_dir", str(out_a)])
    _run("pretrain.py", args + ["--output_dir", str(out_b)],
         extra_env={"ASN_PREEMPT_AT": "4"})   # dies between ckpt(3) and ckpt(6)
    assert (out_b / "last_checkpoint").read_text().strip() == "model_0000002"
    _run("pretrain.py", args + ["--output_dir", str(out_b)])

    a = _load_ckpt(out_a / "model_final")
    b = _load_ckpt(out_b / "model_final")
    assert int(np.asarray(b["step"])) == 6
    _assert_tree_equal(a, b)
