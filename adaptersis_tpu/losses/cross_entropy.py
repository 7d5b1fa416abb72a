"""Cross-entropy family (reference: /root/reference/segloss/ND_Crossentropy.py).
Channel-LAST logits (B, H, W, C), int labels (B, H, W)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.edt import penalized_distance_map


def _flat_ce(logits: jax.Array, labels: jax.Array,
             weight: Optional[jax.Array] = None) -> jax.Array:
    """Per-pixel CE, flattened. torch CrossEntropyLoss(weight=w) semantics:
    mean is weighted by the per-target weight (sum(w_i * l_i) / sum(w_i))."""
    C = logits.shape[-1]
    lp = jax.nn.log_softmax(logits.reshape(-1, C).astype(jnp.float32), axis=-1)
    lab = labels.reshape(-1).astype(jnp.int32)
    nll = -jnp.take_along_axis(lp, lab[:, None], axis=-1)[:, 0]
    if weight is None:
        return nll.mean()
    w = jnp.asarray(weight, jnp.float32)[lab]
    return (nll * w).sum() / w.sum()


def crossentropy_nd(logits: jax.Array, labels: jax.Array,
                    weight: Optional[jax.Array] = None) -> jax.Array:
    """CrossentropyND (ND_Crossentropy.py:11-32)."""
    return _flat_ce(logits, labels, weight)


def weighted_crossentropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """WeightedCrossEntropyLossV2 (ND_Crossentropy.py:78-135) — the class_weights
    are computed then UNUSED in the reference (:135 passes no weight); reproduced."""
    return _flat_ce(logits, labels, weight=None)


def topk_loss(logits: jax.Array, labels: jax.Array, k: float = 10) -> jax.Array:
    """TopKLoss (ND_Crossentropy.py:34-47): mean of the top-k% per-pixel CE."""
    C = logits.shape[-1]
    lp = jax.nn.log_softmax(logits.reshape(-1, C).astype(jnp.float32), axis=-1)
    lab = labels.reshape(-1).astype(jnp.int32)
    nll = -jnp.take_along_axis(lp, lab[:, None], axis=-1)[:, 0]
    n = nll.shape[0]
    kk = int(n * k / 100)
    top = jax.lax.top_k(nll, kk)[0]
    return top.mean()


def dist_penalized_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """DisPenalizedCE (ND_Crossentropy.py:168-208). NOTE the reference computes the
    EDT weighting then returns the UNWEIGHTED loss (:207 returns loss.mean(), not
    weighted_loss) — reproduced faithfully; the weighted variant is available as
    dist_penalized_ce_weighted."""
    return _flat_ce(logits, labels)


def dist_penalized_ce_weighted(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """The (intended) EDT-weighted variant, with the on-device EDT."""
    dist = jax.lax.stop_gradient(penalized_distance_map(labels > 0) + 1.0).reshape(-1)
    C = logits.shape[-1]
    lp = jax.nn.log_softmax(logits.reshape(-1, C).astype(jnp.float32), axis=-1)
    lab = labels.reshape(-1).astype(jnp.int32)
    nll = -jnp.take_along_axis(lp, lab[:, None], axis=-1)[:, 0]
    return (nll * dist).mean()


def weighted_ce_pair(logits: jax.Array, labels: jax.Array,
                     weight=(0.1, 10.0)) -> jax.Array:
    """The validation loss of the main trainer: CE with class weights [0.1, 10]
    (train.py:616-617)."""
    return _flat_ce(logits, labels, weight=jnp.asarray(weight, jnp.float32))
