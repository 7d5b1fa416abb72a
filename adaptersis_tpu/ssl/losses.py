"""SSL losses (reference: dinov2/loss/).

  * dino_loss — cross-entropy between teacher softmax-centered targets and
    student log-softmax over crop pairs (dino_clstoken_loss.py:64-76)
  * softmax_center_teacher / update_center — EMA centering; the reference's
    *async* all_reduce center update (:81-99) becomes a plain global-batch mean
    inside the jitted step (under GSPMD that IS the cross-replica reduction, and
    XLA overlaps it automatically — SURVEY §5)
  * sinkhorn_knopp — the 3-iteration optimal-transport alternative (:34-61)
  * ibot_patch_loss — masked-patch CE with per-sample weights
    (ibot_patch_loss.py:34-151)
  * koleo_loss — −log nearest-neighbor-distance spreading regularizer
    (koleo_loss.py:18-48)

All functional: centers are carried in the train state, not module buffers.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def softmax_center_teacher(teacher_output: jax.Array, center: jax.Array,
                           teacher_temp: float) -> jax.Array:
    return jax.nn.softmax((teacher_output - center) / teacher_temp, axis=-1)


def update_center(center: jax.Array, teacher_output: jax.Array,
                  momentum: float = 0.9) -> jax.Array:
    """EMA center update over the GLOBAL batch (dino_clstoken_loss.py:76-99)."""
    batch_center = jnp.mean(teacher_output.reshape(-1, teacher_output.shape[-1]),
                            axis=0, keepdims=True)
    return center * momentum + batch_center * (1 - momentum)


def sinkhorn_knopp(teacher_output: jax.Array, teacher_temp: float,
                   n_iterations: int = 3) -> jax.Array:
    """Sinkhorn-Knopp teacher assignment (dino_clstoken_loss.py:34-61). Global
    sums are plain reductions (cross-replica under GSPMD)."""
    Q = jnp.exp(teacher_output.astype(jnp.float32) / teacher_temp).T  # (K, B)
    K, B = Q.shape
    Q = Q / jnp.sum(Q)
    for _ in range(n_iterations):
        Q = Q / jnp.sum(Q, axis=1, keepdims=True)
        Q = Q / K
        Q = Q / jnp.sum(Q, axis=0, keepdims=True)
        Q = Q / B
    return (Q * B).T


def dino_loss(student_output_list: Sequence[jax.Array],
              teacher_out_softmaxed_centered_list: Sequence[jax.Array],
              student_temp: float = 0.1) -> jax.Array:
    """Σ over (student crop, teacher crop) pairs of −⟨t, log_softmax(s/τ)⟩
    (dino_clstoken_loss.py:64-76). Pairs where both index the same crop are the
    caller's responsibility to exclude (the reference passes disjoint lists)."""
    total = 0.0
    for s in student_output_list:
        lsm = jax.nn.log_softmax(s.astype(jnp.float32) / student_temp, axis=-1)
        for t in teacher_out_softmaxed_centered_list:
            total = total - jnp.sum(t * lsm, axis=-1).mean()
    return total


def ibot_patch_loss(student_patch_tokens: jax.Array,   # (B, N, K) masked-position logits
                    teacher_softmaxed: jax.Array,      # (B, N, K) targets
                    mask: jax.Array,                   # (B, N) bool — masked positions
                    student_temp: float = 0.1) -> jax.Array:
    """Full-tensor iBOT CE with per-sample weighting 1/n_masked_per_sample and
    the reference's denominator: the CROP COUNT mask.shape[0], unmasked crops
    contributing zero (ibot_patch_loss.py:91-102 `forward` / :105-126
    `forward_masked`, whose Σ w·CE / masks.shape[0] this equals exactly —
    rounds 1-4 divided by the number of masked crops instead, overweighting
    iBOT ~2× at the default mask_sample_probability=0.5; fixed round 5)."""
    lsm = jax.nn.log_softmax(student_patch_tokens.astype(jnp.float32) / student_temp, axis=-1)
    per_token = -jnp.sum(teacher_softmaxed * lsm, axis=-1)            # (B, N)
    m = mask.astype(jnp.float32)
    per_sample_w = 1.0 / jnp.clip(m.sum(axis=1, keepdims=True), 1.0)  # (B, 1)
    loss = (per_token * m * per_sample_w).sum()
    return loss / mask.shape[0]


def ibot_patch_loss_masked(student_masked: jax.Array,  # (U, K) gathered logits
                           teacher_softmaxed: jax.Array,  # (U, K) gathered targets
                           weights: jax.Array,         # (U,) masks_weight; 0 = pad
                           n_crops: int,
                           student_temp: float = 0.1) -> jax.Array:
    """forward_masked on GATHERED masked tokens (ibot_patch_loss.py:105-126):
    −Σ_i w_i·⟨t_i, log_softmax(s_i/τ)⟩ / n_crops, w_i = 1/n_masked(sample_i)
    (`masks_weight`, collate.py:39). Zero-weight padding rows drop out. The
    reference's ×loss_scales(2)×ibot_loss_scale(1/n_global=1/2) net to ×1
    (ssl_meta_arch.py:154,289-335)."""
    lsm = jax.nn.log_softmax(student_masked.astype(jnp.float32) / student_temp, axis=-1)
    per_token = -jnp.sum(teacher_softmaxed * lsm, axis=-1)            # (U,)
    return (per_token * weights).sum() / n_crops


def update_center_masked(center: jax.Array, teacher_masked: jax.Array,
                         weights: jax.Array, n_masked: jax.Array,
                         momentum: float = 0.9) -> jax.Array:
    """iBOT center EMA over the MASKED teacher head outputs only
    (ibot_patch_loss.py:129-151: batch center = mean over the n_masked gathered
    rows; the cross-rank all_reduce is the global mean under GSPMD). Padding
    rows are zero-weighted out via `weights`."""
    valid = (weights > 0).astype(jnp.float32)[:, None]
    bc = (teacher_masked.astype(jnp.float32) * valid).sum(axis=0, keepdims=True)
    bc = bc / jnp.maximum(n_masked.astype(jnp.float32), 1.0)
    return center * momentum + bc * (1 - momentum)


def koleo_loss(student_output: jax.Array, eps: float = 1e-8) -> jax.Array:
    """−log NN-distance over the local batch (koleo_loss.py:18-48; the reference
    computes it per rank, NOT cross-replica — matched by applying it per shard or
    on the global batch, documented at the call site)."""
    x = student_output.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    dots = x @ x.T
    n = x.shape[0]
    dots = dots - 2.0 * jnp.eye(n)  # exclude self (reference fills diag with -1)
    nn_idx = jnp.argmax(dots, axis=1)
    d = jnp.linalg.norm(x - x[nn_idx], axis=-1)
    return -jnp.log(d + eps).mean()
