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
