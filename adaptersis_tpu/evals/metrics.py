"""Classification metrics (reference: dinov2/eval/metrics.py — torchmetrics
MulticlassAccuracy top-1/5 micro/macro + ImageNetReaLAccuracy, :20-113).

Implemented as pure jnp reductions + a tiny streaming accumulator (replacing the
torchmetrics dependency); everything jittable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def topk_accuracy(logits: jax.Array, labels: jax.Array, k: int = 1,
                  average: str = "micro", num_classes: Optional[int] = None) -> jax.Array:
    """top-k accuracy; average ∈ {micro, macro, none} (metrics.py:43-68)."""
    topk = jnp.argsort(-logits, axis=-1)[:, :k]
    hit = jnp.any(topk == labels[:, None], axis=-1).astype(jnp.float32)
    if average == "micro":
        return hit.mean()
    C = num_classes or logits.shape[-1]
    onehot = jax.nn.one_hot(labels, C)
    per_class = (hit[:, None] * onehot).sum(0) / jnp.maximum(onehot.sum(0), 1.0)
    if average == "none":
        return per_class
    present = (onehot.sum(0) > 0).astype(jnp.float32)
    return (per_class * present).sum() / jnp.maximum(present.sum(), 1.0)


def real_accuracy(logits: jax.Array, multilabel_targets: jax.Array, k: int = 1) -> jax.Array:
    """ImageNet-ReaL: correct if the top-1 prediction is in the target set
    (metrics.py:70-113). multilabel_targets: (B, C) 0/1."""
    top1 = jnp.argmax(logits, axis=-1)
    hit = jnp.take_along_axis(multilabel_targets, top1[:, None], axis=-1)[:, 0]
    valid = multilabel_targets.sum(-1) > 0
    return (hit * valid).sum() / jnp.maximum(valid.sum(), 1.0)


@dataclass
class MetricAccumulator:
    """Streaming (count, correct) accumulator with the MetricLogger psum
    semantics."""

    correct: float = 0.0
    count: float = 0.0

    def update(self, hits: jax.Array, n: int) -> None:
        self.correct += float(hits) * n
        self.count += n

    @property
    def value(self) -> float:
        return self.correct / max(self.count, 1.0)


def build_metric(metric_type: str = "mean_accuracy", ks=(1, 5)):
    """Factory mirroring dinov2 build_metric: returns dict name → fn(logits, y)."""
    avg = {"mean_accuracy": "micro", "mean_per_class_accuracy": "macro",
           "per_class_accuracy": "none"}.get(metric_type, "micro")
    return {f"top-{k}": (lambda k=k: (lambda lg, y: topk_accuracy(lg, y, k=k, average=avg)))()
            for k in ks}
