"""Lovász-Softmax loss (reference: /root/reference/segloss/lovasz_loss.py).

The sort-based Jaccard surrogate: per class, sort |target − prob| descending, dot
with the Lovász-extension gradient of the sorted ground truth. On TPU the sort is
jax.lax.sort (XLA bitonic) and the cumsums are lax scans — fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovász extension w.r.t. sorted errors (lovasz_loss.py:7-19)."""
    p = gt_sorted.shape[0]
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted, 0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, 0)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax(probs: jax.Array, labels: jax.Array, reduction: str = "mean") -> jax.Array:
    """LovaszSoftmax (lovasz_loss.py:22-67). probs (B, H, W, C), labels (B, H, W).
    Like the reference, flattens batch+spatial into one set."""
    C = probs.shape[-1]
    p = probs.reshape(-1, C).astype(jnp.float32)
    lab = labels.reshape(-1)

    def class_loss(c: int) -> jax.Array:
        target_c = (lab == c).astype(jnp.float32)
        input_c = p[:, 0] if C == 1 else p[:, c]
        errors = jnp.abs(target_c - input_c)
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        target_sorted = target_c[order]
        return jnp.dot(errors_sorted, jax.lax.stop_gradient(lovasz_grad(target_sorted)))

    losses = jnp.stack([class_loss(c) for c in range(C)])
    if reduction == "none":
        return losses
    if reduction == "sum":
        return losses.sum()
    return losses.mean()
