"""Shared loss plumbing (reference: /root/reference/segloss/dice_loss.py:12-81).

Convention: predictions are channel-LAST (B, H, W, C) — TPU-native layout — and
labels are integer maps (B, H, W). `axes` semantics mirror the nnU-Net helpers:
per-(batch, class) reductions sum over spatial axes only; `batch_dice` also sums
over batch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def softmax_cl(x: jax.Array) -> jax.Array:
    """softmax over the trailing class axis (reference softmax_helper, axis=1 in NCHW)."""
    return jax.nn.softmax(x, axis=-1)


def one_hot_cl(labels: jax.Array, num_classes: int) -> jax.Array:
    """(B, H, W) int → (B, H, W, C) float one-hot (reference scatter_ one-hot)."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def get_tp_fp_fn(
    net_output: jax.Array,        # (B, H, W, C) probabilities (or logits pre-nonlin)
    gt: jax.Array,                # (B, H, W) int labels or (B, H, W, C) one-hot
    batch_dice: bool = False,
    mask: Optional[jax.Array] = None,   # (B, H, W) valid-pixel mask
    square: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """nnU-Net soft TP/FP/FN (segloss/dice_loss.py:31-81). Returns (C,) if
    batch_dice else (B, C)."""
    C = net_output.shape[-1]
    y = gt if gt.ndim == net_output.ndim else one_hot_cl(gt, C)
    y = jax.lax.stop_gradient(y.astype(net_output.dtype))
    tp = net_output * y
    fp = net_output * (1 - y)
    fn = (1 - net_output) * y
    if mask is not None:
        m = mask.astype(net_output.dtype)[..., None]
        tp, fp, fn = tp * m, fp * m, fn * m
    if square:
        tp, fp, fn = tp * tp, fp * fp, fn * fn
    axes = (0, 1, 2) if batch_dice else (1, 2)
    return tp.sum(axes), fp.sum(axes), fn.sum(axes)


def drop_bg(x: jax.Array, batch_dice: bool) -> jax.Array:
    """do_bg=False slicing (dice_loss.py:281-286): drop class 0."""
    return x[1:] if batch_dice else x[:, 1:]
