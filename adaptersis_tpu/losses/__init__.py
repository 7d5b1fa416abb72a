"""Loss zoo registry (reference: /root/reference/segloss/).

All losses take channel-LAST predictions (B, H, W, C) and integer labels (B, H, W).
"""

from .boundary import bd_loss, compute_edts_forhdloss, dc_and_bd_loss, dist_binary_dice_loss
from .cross_entropy import (
    crossentropy_nd,
    dist_penalized_ce,
    dist_penalized_ce_weighted,
    topk_loss,
    weighted_ce_pair,
    weighted_crossentropy,
)
from .dice import (
    asym_loss,
    dc_and_ce_loss,
    dc_and_topk_loss,
    dc_loss,
    explog_loss,
    focal_tversky_loss,
    gdice_loss,
    gdice_v2_loss,
    iou_nnunet_loss,
    penalty_gdice_loss,
    soft_dice_loss,
    ss_loss,
    tversky_loss,
)
from .focal import focal_loss
from .functional import get_tp_fp_fn, one_hot_cl, softmax_cl
from .hausdorff import hausdorff_dt_loss, hausdorff_er_loss
from .iou_multi import ch_iou, iou, iou_loss, isi_iou, pixel_accuracy
from .lovasz import lovasz_grad, lovasz_softmax

import jax as _jax
import jax.numpy as _jnp


def flat_dice_coefficient(output, target, eps: float = 1e-7):
    """Flattened binary dice (eval/eval_dinov2_masktrans.py:83-88)."""
    o = output.reshape(-1).astype(_jnp.float32)
    t = target.reshape(-1).astype(_jnp.float32)
    inter = (o * t).sum()
    return (2.0 * inter + eps) / (o.sum() + t.sum() + eps)


def ce_dc_loss(logits, labels):
    """CE + DC dice on raw logits — the eval-script SETR/UNet/UNet-fuse training
    loss (eval_dinov2_setr.py:292-298, eval_dinov2_or_unet_fuse.py:322-328)."""
    return crossentropy_nd(logits, labels) + dc_loss(logits, labels)


def masktrans_train_loss(logits, labels):
    """weighted CE [0.1,10] + (1 − flat dice on ARGMAX preds)
    (eval_dinov2_masktrans.py:304-312). The dice term is non-differentiable —
    gradient comes from the CE only (reference quirk, SURVEY §2.12 #7)."""
    preds = _jnp.argmax(logits, axis=-1)
    return weighted_ce_pair(logits, labels) + (1.0 - flat_dice_coefficient(preds, labels))


# name → callable(logits_or_probs, labels) for the CLI --loss flag
LOSSES = {
    "dc": dc_loss,
    "soft_dice": lambda x, y: soft_dice_loss(x, y, apply_nonlin=softmax_cl),
    "dice_ce": dc_and_ce_loss,
    "dice_topk": dc_and_topk_loss,
    "gdice": lambda x, y: gdice_loss(x, y, apply_nonlin=softmax_cl),
    "tversky": lambda x, y: tversky_loss(x, y, apply_nonlin=softmax_cl),
    "focal_tversky": lambda x, y: focal_tversky_loss(x, y, apply_nonlin=softmax_cl),
    "asym": lambda x, y: asym_loss(x, y, apply_nonlin=softmax_cl),
    "iou_nnunet": lambda x, y: iou_nnunet_loss(x, y, apply_nonlin=softmax_cl),
    "iou_multi": iou_loss,
    "ce": crossentropy_nd,
    "topk": topk_loss,
    "focal": lambda x, y: focal_loss(softmax_cl(x), y),
    "lovasz": lambda x, y: lovasz_softmax(softmax_cl(x), y),
    "explog": explog_loss,
    "dist_dice": dist_binary_dice_loss,
    "hausdorff_dt": lambda x, y: hausdorff_dt_loss(softmax_cl(x)[..., 1], y),
    "hausdorff_er": lambda x, y: hausdorff_er_loss(softmax_cl(x)[..., 1], y),
    "ce_dc": ce_dc_loss,
    "masktrans": masktrans_train_loss,
    "dc_and_hausdorff": lambda x, y: dc_loss(x, y) + hausdorff_dt_loss(softmax_cl(x)[..., 1], y),
}
