"""Dice-family losses (reference: /root/reference/segloss/dice.py and
segloss/dice_loss.py). Channel-LAST predictions (B, H, W, C), int labels (B, H, W).

`dc_loss` is the loss actually used by the main trainer (train.py:267,428). Note
the reference's double softmax: the trainer applies Softmax at train.py:424 and DC
softmaxes again internally (segloss/dice.py:23, SURVEY §2.12 #3) — our trainer
reproduces that by passing softmaxed probs into dc_loss, which softmaxes again.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .cross_entropy import crossentropy_nd, topk_loss, weighted_crossentropy
from .functional import drop_bg, get_tp_fp_fn, one_hot_cl, softmax_cl


def dc_loss(output: jax.Array, target: jax.Array) -> jax.Array:
    """The `DC` loss (segloss/dice.py:5-37): softmax → one-hot → per-(batch,class)
    dice over spatial axes, eps 10e-20 in the denominator, 1 - mean."""
    C = output.shape[-1]
    p = softmax_cl(output)
    y = target if target.ndim == p.ndim else one_hot_cl(target, C)
    y = jax.lax.stop_gradient(y.astype(p.dtype))
    intersect = jnp.sum(p * y, axis=(1, 2))
    dice = (2 * intersect) / (jnp.sum(p, axis=(1, 2)) + jnp.sum(y, axis=(1, 2)) + 10e-20)
    return 1.0 - dice.mean()


def _ratio_loss(num, den, do_bg: bool, batch_dice: bool) -> jax.Array:
    r = num / den
    if not do_bg:
        r = drop_bg(r, batch_dice)
    return -r.mean()


def soft_dice_loss(x, y, apply_nonlin=None, batch_dice=False, do_bg=True, smooth=1.0,
                   square=False, loss_mask=None) -> jax.Array:
    """SoftDiceLoss (dice_loss.py:255-291). Returns −dice like the reference."""
    if apply_nonlin is not None:
        x = apply_nonlin(x)
    tp, fp, fn = get_tp_fp_fn(x, y, batch_dice, loss_mask, square)
    return _ratio_loss(2 * tp + smooth, 2 * tp + fp + fn + smooth, do_bg, batch_dice)


def iou_nnunet_loss(x, y, apply_nonlin=None, batch_dice=False, do_bg=True, smooth=1.0,
                    square=False, loss_mask=None) -> jax.Array:
    """IoULoss (dice_loss.py:293-331)."""
    if apply_nonlin is not None:
        x = apply_nonlin(x)
    tp, fp, fn = get_tp_fp_fn(x, y, batch_dice, loss_mask, square)
    return _ratio_loss(tp + smooth, tp + fp + fn + smooth, do_bg, batch_dice)


def tversky_loss(x, y, apply_nonlin=None, batch_dice=False, do_bg=True, smooth=1.0,
                 square=False, alpha=0.3, beta=0.7, loss_mask=None) -> jax.Array:
    """TverskyLoss α=.3 β=.7 (dice_loss.py:333-372)."""
    if apply_nonlin is not None:
        x = apply_nonlin(x)
    tp, fp, fn = get_tp_fp_fn(x, y, batch_dice, loss_mask, square)
    return _ratio_loss(tp + smooth, tp + alpha * fp + beta * fn + smooth, do_bg, batch_dice)


def focal_tversky_loss(x, y, gamma=0.75, **tversky_kwargs) -> jax.Array:
    """FocalTversky_loss (dice_loss.py:374-387): (1 + tversky_loss)^gamma."""
    t = 1.0 + tversky_loss(x, y, **tversky_kwargs)
    return jnp.power(t, gamma)


def asym_loss(x, y, apply_nonlin=None, batch_dice=False, do_bg=True, smooth=1.0,
              square=False, beta=1.5, loss_mask=None) -> jax.Array:
    """AsymLoss β=1.5 (dice_loss.py:390-427)."""
    if apply_nonlin is not None:
        x = apply_nonlin(x)
    tp, fp, fn = get_tp_fp_fn(x, y, batch_dice, loss_mask, square)
    w = (beta * beta) / (1 + beta * beta)
    return _ratio_loss(tp + smooth, tp + w * fn + (1 - w) * fp + smooth, do_bg, batch_dice)


def ss_loss(x, y, apply_nonlin=None, batch_dice=False, do_bg=True, smooth=1.0,
            r=0.1) -> jax.Array:
    """Sensitivity-Specificity loss (dice_loss.py:192-251)."""
    C = x.shape[-1]
    if apply_nonlin is not None:
        x = apply_nonlin(x)
    yh = y if y.ndim == x.ndim else one_hot_cl(y, C)
    yh = jax.lax.stop_gradient(yh.astype(x.dtype))
    bg = 1 - yh
    sq = (yh - x) ** 2
    axes = (0, 1, 2) if batch_dice else (1, 2)
    spec = (sq * yh).sum(axes) / (yh.sum(axes) + smooth)
    sens = (sq * bg).sum(axes) / (bg.sum(axes) + smooth)
    ss = r * spec + (1 - r) * sens
    if not do_bg:
        ss = drop_bg(ss, batch_dice)
    return ss.mean()


def gdice_loss(x, y, apply_nonlin=None, smooth=1e-5) -> jax.Array:
    """Generalized Dice (dice_loss.py:84-131): w_c = 1/(Σ y_c)², dice over classes
    summed per batch element, returns −mean."""
    C = x.shape[-1]
    yh = y if y.ndim == x.ndim else one_hot_cl(y, C)
    yh = jax.lax.stop_gradient(yh.astype(jnp.float32))
    if apply_nonlin is not None:
        x = apply_nonlin(x)
    x = x.astype(jnp.float32)
    ysum = yh.sum(axis=(1, 2))                                  # (B, C)
    w = 1.0 / (ysum + 1e-10) ** 2
    inter = w * jnp.einsum("bhwc,bhwc->bc", x, yh)
    union = w * (x.sum(axis=(1, 2)) + ysum)
    divided = -2 * (inter.sum(-1) + smooth) / (union.sum(-1) + smooth)
    return divided.mean()


def gdice_v2_loss(x, y, apply_nonlin=None, smooth=1e-5) -> jax.Array:
    """GDiceLossV2 (dice_loss.py:148-189): class-flattened variant with clamped
    weights."""
    C = x.shape[-1]
    yh = y if y.ndim == x.ndim else one_hot_cl(y, C)
    yh = jax.lax.stop_gradient(yh.astype(jnp.float32))
    if apply_nonlin is not None:
        x = apply_nonlin(x)
    xf = x.astype(jnp.float32).reshape(-1, C).T                  # (C, N)
    yf = yh.reshape(-1, C).T
    tsum = yf.sum(-1)
    w = 1.0 / jnp.maximum(tsum * tsum, smooth)
    inter = ((xf * yf).sum(-1) * w).sum()
    denom = jnp.maximum((((xf + yf).sum(-1)) * w).sum(), smooth)
    return -2.0 * inter / denom


def penalty_gdice_loss(x, y, k=2.5, **gdice_kwargs) -> jax.Array:
    """PenaltyGDiceLoss (dice_loss.py:461-474)."""
    g = gdice_loss(x, y, apply_nonlin=softmax_cl, **gdice_kwargs)
    return g / (1 + k * (1 - g))


def dc_and_ce_loss(x, y) -> jax.Array:
    """DC_and_CE_loss (dice_loss.py:445-459): CrossentropyND + SoftDiceLoss, both on
    raw logits (note: the reference's SoftDiceLoss here has NO nonlin — logits go
    straight into the dice ratio; reproduced faithfully)."""
    return crossentropy_nd(x, y) + soft_dice_loss(x, y)


def dc_and_topk_loss(x, y, k=10, soft_dice_kwargs=None) -> jax.Array:
    """DC_and_topk_loss (dice_loss.py:478-492)."""
    sd = soft_dice_loss(x, y, apply_nonlin=softmax_cl, **(soft_dice_kwargs or {}))
    return topk_loss(x, y, k=k) + sd


def explog_loss(x, y, gamma=0.3, soft_dice_kwargs=None) -> jax.Array:
    """ExpLog_loss (dice_loss.py:496-519)."""
    dc = -soft_dice_loss(x, y, apply_nonlin=softmax_cl, **(soft_dice_kwargs or {}))
    wce = weighted_crossentropy(x, y)
    return 0.8 * jnp.power(-jnp.log(jnp.clip(dc, 1e-6)), gamma) + 0.2 * wce
