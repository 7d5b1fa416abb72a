"""Checkpoint save/resume via orbax (reference: torch.save dict
{epoch, state_dict, optimizer, scheduler, best_acc} at train.py:248-255 +
utils.py:152-184 restart_from_checkpoint).

Deltas from the reference, on purpose:
  * orbax async-capable multi-host checkpointing instead of rank-0 torch.save
  * the FULL trainable state is saved — the reference only saves the decoder and
    silently drops adapters/encoder (train.py:250, SURVEY §2.12 / §5 'must fix')
  * single rolling "checkpoint" directory mirrors the reference's single
    checkpoint.pth.tar (resume-any semantics).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _path(output_dir: str, name: str = "checkpoint") -> str:
    return os.path.join(os.path.abspath(output_dir), name)


def save_checkpoint(output_dir: str, state: Dict[str, Any], name: str = "checkpoint") -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_path(output_dir, name), state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(output_dir: str, target: Dict[str, Any],
                       name: str = "checkpoint") -> Optional[Dict[str, Any]]:
    """Restore into the structure of `target`; returns None if absent
    (restart_from_checkpoint 'not found → start fresh' semantics, utils.py:152-160)."""
    path = _path(output_dir, name)
    if not os.path.exists(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)


class PeriodicCheckpointer:
    """fvcore-style iteration-keyed retention (reference: PeriodicCheckpointer
    used by dinov2/train/train.py:158-162 with max_to_keep=3 and
    dinov2/eval/adapter.py:347-394; tag-file semantics from
    dinov2/fsdp/__init__.py:118-154).

      * every `period` iterations saves `model_{iteration:07d}`
      * keeps only the newest `max_to_keep` periodic saves (model_final and the
        user's own names are never reaped)
      * writes a `last_checkpoint` tag file naming the newest save
      * at `max_iter − 1` additionally saves `model_final`
    """

    def __init__(self, output_dir: str, period: int, max_iter: Optional[int] = None,
                 max_to_keep: Optional[int] = None):
        self.output_dir = os.path.abspath(output_dir)
        self.period = int(period)
        self.max_iter = max_iter
        self.max_to_keep = max_to_keep
        self._recent: list[str] = []
        os.makedirs(self.output_dir, exist_ok=True)

    def _tag(self, name: str) -> None:
        with open(os.path.join(self.output_dir, "last_checkpoint"), "w") as f:
            f.write(name)

    def get_checkpoint_file(self) -> str:
        """Newest save per the tag file, '' if none (fsdp/__init__.py:126-141)."""
        tag = os.path.join(self.output_dir, "last_checkpoint")
        if not os.path.exists(tag):
            return ""
        with open(tag) as f:
            name = f.read().strip()
        return os.path.join(self.output_dir, name) if name else ""

    def save(self, name: str, state: Dict[str, Any]) -> None:
        save_checkpoint(self.output_dir, state, name=name)
        self._tag(name)

    def step(self, iteration: int, state: Dict[str, Any]) -> None:
        if (iteration + 1) % self.period == 0:
            name = f"model_{iteration:07d}"
            self.save(name, state)
            self._recent.append(name)
            if self.max_to_keep is not None:
                while len(self._recent) > self.max_to_keep:
                    victim = self._recent.pop(0)
                    path = _path(self.output_dir, victim)
                    if os.path.exists(path):
                        import shutil

                        shutil.rmtree(path, ignore_errors=True)
        if self.max_iter is not None and iteration >= self.max_iter - 1:
            self.save("model_final", state)
