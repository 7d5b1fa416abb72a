"""Mask2Former training criterion (reference:
dinov2/eval/segmentation_m2f/models/losses/ + mask2former_head.py loss plumbing).

Per decoder layer: Hungarian-match queries to ground-truth segments with
(classification, point-sampled mask BCE, point-sampled dice) costs
(utils/assigner.py:46-157, losses/match_costs.py:13-153), then
  * CE over classes with no-object weight 0.1 (losses/cross_entropy_loss.py)
  * sigmoid BCE + naive dice on K uncertainty-sampled points of matched masks
    (losses/dice_loss.py:12-153, point sampling per mask2former_head.py)

Ground truth here is (B, G, H, W) binary masks + (B, G) labels with G a static
max-segments pad (label -1 = padding).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from .mask2former import hungarian_match, point_sample, uncertainty_sample_points


def naive_dice(pred: jax.Array, target: jax.Array, eps: float = 1.0) -> jax.Array:
    """naive dice on point sets: (..., P) sigmoid probs vs 0/1 targets."""
    num = 2 * (pred * target).sum(-1)
    den = pred.sum(-1) + target.sum(-1) + eps
    return 1 - (num + eps) / den


def m2f_layer_loss(
    cls_logits: jax.Array,      # (B, Q, C+1)
    mask_logits: jax.Array,     # (B, Q, h, w)
    gt_masks: jax.Array,        # (B, G, H, W) float 0/1
    gt_labels: jax.Array,       # (B, G) int, -1 = pad
    rng: jax.Array,
    num_points: int = 256,
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    no_object_weight: float = 0.1,
) -> Dict[str, jax.Array]:
    B, Q, C1 = cls_logits.shape
    G = gt_masks.shape[1]
    num_classes = C1 - 1
    valid_gt = (gt_labels >= 0)                           # (B, G)
    h, w = mask_logits.shape[2:]
    gt_small = jax.image.resize(gt_masks, (B, G, h, w), "nearest")

    # ---- matching costs on a shared random point set per image ----
    k1, k2 = jax.random.split(rng)
    pts = jax.random.uniform(k1, (B, num_points, 2))
    mp = jax.vmap(lambda m, p: point_sample(m, jnp.broadcast_to(p[None], (m.shape[0],) + p.shape)))(
        mask_logits, pts)                                  # (B, Q, P)
    gp = jax.vmap(lambda m, p: point_sample(m, jnp.broadcast_to(p[None], (m.shape[0],) + p.shape)))(
        gt_small, pts)                                     # (B, G, P)

    cls_prob = jax.nn.softmax(cls_logits, -1)              # (B, Q, C+1)
    safe_labels = jnp.clip(gt_labels, 0, num_classes - 1)
    cost_cls = -jnp.take_along_axis(
        cls_prob[:, :, None, :].repeat(G, 2),
        safe_labels[:, None, :, None].repeat(Q, 1), axis=-1)[..., 0]   # (B, Q, G)

    mprob = jax.nn.sigmoid(mp)
    # BCE cost: mean over points of bce(pred_point, gt_point)
    bce_pos = -jax.nn.log_sigmoid(mp)                      # (B, Q, P)
    bce_neg = -jax.nn.log_sigmoid(-mp)
    cost_mask = (jnp.einsum("bqp,bgp->bqg", bce_pos, gp)
                 + jnp.einsum("bqp,bgp->bqg", bce_neg, 1 - gp)) / num_points
    num = 2 * jnp.einsum("bqp,bgp->bqg", mprob, gp)
    den = mprob.sum(-1)[:, :, None] + gp.sum(-1)[:, None, :] + 1.0
    cost_dice = 1 - (num + 1.0) / den

    cost = (class_weight * cost_cls + mask_weight * cost_mask + dice_weight * cost_dice)
    cost = jnp.where(valid_gt[:, None, :], cost, 1e6)      # pad columns unattractive
    cost = jax.lax.stop_gradient(cost)
    assign = hungarian_match(cost)                         # (B, 2, G)
    q_idx, g_idx = assign[:, 0], assign[:, 1]              # (B, G)

    # ---- classification loss: matched queries get their gt class, rest no-object
    target_cls = jnp.full((B, Q), num_classes, jnp.int32)
    matched_labels = jnp.take_along_axis(safe_labels, g_idx, axis=1)
    matched_valid = jnp.take_along_axis(valid_gt, g_idx, axis=1)
    target_cls = jax.vmap(
        lambda tc, qi, lab, val: tc.at[qi].set(jnp.where(val, lab, tc[qi]))
    )(target_cls, q_idx, matched_labels, matched_valid)
    wvec = jnp.concatenate([jnp.ones(num_classes), jnp.asarray([no_object_weight])])
    logp = jax.nn.log_softmax(cls_logits, -1)
    ce = -jnp.take_along_axis(logp, target_cls[..., None], -1)[..., 0]
    wts = wvec[target_cls]
    loss_cls = (ce * wts).sum() / jnp.maximum(wts.sum(), 1.0)

    # ---- mask losses on matched pairs with uncertainty-sampled points ----
    m_matched = jnp.take_along_axis(mask_logits, q_idx[:, :, None, None], axis=1)  # (B, G, h, w)
    g_matched = jnp.take_along_axis(gt_small, g_idx[:, :, None, None], axis=1)
    flat_m = m_matched.reshape(B * G, h, w)
    flat_g = g_matched.reshape(B * G, h, w)
    upts = uncertainty_sample_points(flat_m, num_points, k2)
    mpts = point_sample(flat_m, upts)                      # (B*G, P)
    gpts = point_sample(flat_g, upts)
    vm = (matched_valid.reshape(-1)).astype(jnp.float32)
    n_valid = jnp.maximum(vm.sum(), 1.0)
    bce = (jnp.maximum(mpts, 0) - mpts * gpts + jnp.log1p(jnp.exp(-jnp.abs(mpts)))).mean(-1)
    loss_mask = (bce * vm).sum() / n_valid
    dl = naive_dice(jax.nn.sigmoid(mpts), gpts)
    loss_dice = (dl * vm).sum() / n_valid

    return {
        "loss_cls": class_weight * loss_cls,
        "loss_mask": mask_weight * loss_mask,
        "loss_dice": dice_weight * loss_dice,
    }


def m2f_total_loss(cls_all: Sequence[jax.Array], mask_all: Sequence[jax.Array],
                   gt_masks: jax.Array, gt_labels: jax.Array, rng: jax.Array,
                   **kw) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum over all decoder layers (per-layer aux supervision,
    mask2former_head.py loss aggregation)."""
    total = 0.0
    logs = {}
    for i, (c, m) in enumerate(zip(cls_all, mask_all)):
        rng, k = jax.random.split(rng)
        parts = m2f_layer_loss(c, m, gt_masks, gt_labels, k, **kw)
        total = total + sum(parts.values())
        if i == len(cls_all) - 1:
            logs = parts
    return total, logs


def semantic_to_instances(mask: jax.Array, num_classes: int, max_segments: int):
    """Per-class binary masks from a semantic map → (G, H, W) masks + (G,) labels
    with -1 padding (the semantic-segmentation ground-truth prep the reference
    does in its dataset pipeline)."""
    H, W = mask.shape
    labels = jnp.arange(1, num_classes)
    masks = (mask[None] == labels[:, None, None]).astype(jnp.float32)
    present = masks.sum((1, 2)) > 0
    labels = jnp.where(present, labels, -1)
    pad = max_segments - (num_classes - 1)
    if pad > 0:
        masks = jnp.concatenate([masks, jnp.zeros((pad, H, W))], 0)
        labels = jnp.concatenate([labels, jnp.full((pad,), -1, labels.dtype)])
    return masks[:max_segments], labels[:max_segments]


def slide_inference(fwd, image: jax.Array, window: int, stride: int,
                    num_classes: int) -> jax.Array:
    """Sliding-window inference with overlap count normalization
    (segmentors/encoder_decoder_mask2former.py:17-271 slide mode)."""
    B, H, W, _ = image.shape
    out = jnp.zeros((B, H, W, num_classes))
    cnt = jnp.zeros((B, H, W, 1))
    ys = list(range(0, max(H - window, 0) + 1, stride)) or [0]
    xs = list(range(0, max(W - window, 0) + 1, stride)) or [0]
    if ys[-1] != H - window:
        ys.append(H - window)
    if xs[-1] != W - window:
        xs.append(W - window)
    for y0 in ys:
        for x0 in xs:
            crop = jax.lax.dynamic_slice(image, (0, y0, x0, 0), (B, window, window, image.shape[-1]))
            logits = fwd(crop)
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (0, y0, x0, 0), (B, window, window, num_classes)) + logits,
                (0, y0, x0, 0))
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(cnt, (0, y0, x0, 0), (B, window, window, 1)) + 1.0,
                (0, y0, x0, 0))
    return out / jnp.maximum(cnt, 1.0)
