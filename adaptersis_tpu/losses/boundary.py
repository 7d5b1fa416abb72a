"""Boundary / distance-map losses (reference: /root/reference/segloss/boundary_loss.py).

The reference computes euclidean distance transforms with scipy ON CPU inside the
loss forward (boundary_loss.py:164-190) — here they run on device (ops/edt.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.edt import edt_signed_pair, penalized_distance_map
from .dice import soft_dice_loss
from .functional import one_hot_cl, softmax_cl


def bd_loss(logits: jax.Array, bound: jax.Array) -> jax.Array:
    """BDLoss (boundary_loss.py:82-106): mean of softmax foreground probs times the
    precomputed boundary distance map. logits (B,H,W,C), bound (B,H,W,C)."""
    p = softmax_cl(logits).astype(jnp.float32)
    pc = p[..., 1:]
    dc = bound[..., 1:].astype(jnp.float32)
    return (pc * dc).mean()


def dc_and_bd_loss(logits, target, bound, soft_dice_kwargs=None) -> jax.Array:
    """DC_and_BD_loss (boundary_loss.py:147-161)."""
    sd = soft_dice_loss(logits, target, apply_nonlin=softmax_cl, **(soft_dice_kwargs or {}))
    return sd + bd_loss(logits, bound)


def compute_edts_forhdloss(mask: jax.Array) -> jax.Array:
    """posdist + negdist (boundary_loss.py:164-170), on device. mask (B,H,W) bool."""
    return edt_signed_pair(mask)


def dist_binary_dice_loss(logits: jax.Array, target: jax.Array, smooth: float = 1e-5) -> jax.Array:
    """DistBinaryDiceLoss (boundary_loss.py:192-239): distance-penalized dice where
    TP is weighted by the inverted-EDT map of the ground truth."""
    C = logits.shape[-1]
    p = softmax_cl(logits).astype(jnp.float32)
    y = one_hot_cl(target, C)
    dist = jax.lax.stop_gradient(penalized_distance_map(target > 0) + 1.0)
    tp = (p[..., 1] * y[..., 1] * dist).sum(axis=(1, 2))
    dc = (2 * tp + smooth) / (p[..., 1].sum(axis=(1, 2)) + y[..., 1].sum(axis=(1, 2)) + smooth)
    return -dc.mean()
