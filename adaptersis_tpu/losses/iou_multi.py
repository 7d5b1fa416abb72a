"""EndoVis challenge IoU metrics + multi-class IoU training loss
(reference: /root/reference/segloss/iou_multi.py).

ch_iou / isi_iou implement the challenge protocol's skip-absent-class rules
(:51-88): data-dependent control flow in the reference numpy code, expressed here
with presence masks so everything jits. Empty-ground-truth edge cases (:54-58,
:77-81) are reproduced exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou(y_true: jax.Array, y_pred: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Binary soft IoU (:4-7)."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    inter = (y_true * y_pred).sum()
    union = y_true.sum() + y_pred.sum() - inter
    return (inter + eps) / (union + eps)


def iou_loss(preds: jax.Array, labels: jax.Array, smooth: float = 1e-6,
             num_classes: int | None = None) -> jax.Array:
    """Soft per-class IoU training loss (:9-49), the train_multi_class.py loss
    (train_multi_class.py:393, num_classes=8 there). preds: (B, H, W, C) logits,
    labels: (B, H, W)."""
    num_classes = num_classes if num_classes is not None else preds.shape[-1]
    p = jax.nn.softmax(preds.astype(jnp.float32), axis=-1)
    y = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    inter = (p * y).sum(axis=(1, 2))                              # (B, C)
    union = p.sum(axis=(1, 2)) + y.sum(axis=(1, 2)) - inter
    iou_pc = (inter + smooth) / (union + smooth)
    return (1.0 - iou_pc).mean()


def ch_iou(y_true: jax.Array, y_pred: jax.Array, num_classes: int = 8) -> jax.Array:
    """Challenge IoU (:51-65): mean IoU over the non-bg classes PRESENT in y_true;
    1 if both maps are empty, 0 if only the prediction has foreground."""
    y_true = y_true.astype(jnp.int32)
    y_pred = y_pred.astype(jnp.int32)
    per_class = []
    present = []
    for c in range(1, num_classes):
        t = y_true == c
        present.append(jnp.any(t))
        per_class.append(iou(t, y_pred == c))
    per_class = jnp.stack(per_class)
    present = jnp.stack(present).astype(jnp.float32)
    n = present.sum()
    mean_present = (per_class * present).sum() / jnp.maximum(n, 1.0)
    gt_empty = y_true.sum() == 0
    pred_empty = y_pred.sum() == 0
    return jnp.where(gt_empty, jnp.where(pred_empty, 1.0, 0.0), mean_present)


def isi_iou(y_true: jax.Array, y_pred: jax.Array, problem_type: str = "instruments") -> jax.Array:
    """ISI IoU (:67-88): mean IoU over classes present in EITHER map."""
    type_number = {"binary": 2, "parts": 4, "instruments": 8}[problem_type]
    y_true = y_true.astype(jnp.int32)
    y_pred = y_pred.astype(jnp.int32)
    per_class = []
    present = []
    for c in range(1, type_number):
        t = y_true == c
        p = y_pred == c
        present.append(jnp.any(t) | jnp.any(p))
        per_class.append(iou(t, p))
    per_class = jnp.stack(per_class)
    present = jnp.stack(present).astype(jnp.float32)
    n = present.sum()
    mean_present = (per_class * present).sum() / jnp.maximum(n, 1.0)
    gt_empty = y_true.sum() == 0
    pred_empty = y_pred.sum() == 0
    return jnp.where(gt_empty, jnp.where(pred_empty, 1.0, 0.0), mean_present)


def pixel_accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """acc1 of the main trainer: mean(argmax == target) (train.py:642)."""
    return (jnp.argmax(logits, axis=-1) == labels).mean()
