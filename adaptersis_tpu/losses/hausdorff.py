"""Hausdorff losses (reference: /root/reference/segloss/hausdorff.py).

Both variants run per-forward CPU numpy/scipy in the reference (EDT :36-38,
scipy.convolve :123); here everything is on-device XLA with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.edt import edt

_CROSS = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0]]) * 0.2


def _distance_field(img: jax.Array) -> jax.Array:
    """hausdorff.py:27-42: posdist+negdist where the fg mask is non-empty, else 0."""
    fg = img > 0.5
    field = edt(fg) + edt(~fg)
    any_fg = jnp.any(fg, axis=(1, 2), keepdims=True)
    return jnp.where(any_fg, field, 0.0)


def hausdorff_dt_loss(pred: jax.Array, target: jax.Array, alpha: float = 2.0) -> jax.Array:
    """HausdorffDTLoss (hausdorff.py:19-80). pred/target: (B, H, W) single-channel
    fg probabilities/labels (reference uses (b, 1, x, y))."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    pred_dt = jax.lax.stop_gradient(_distance_field(pred))
    target_dt = jax.lax.stop_gradient(_distance_field(target))
    pred_error = (pred - target) ** 2
    distance = pred_dt**alpha + target_dt**alpha
    return (pred_error * distance).mean()


def hausdorff_er_loss(pred: jax.Array, target: jax.Array, alpha: float = 2.0,
                      erosions: int = 10) -> jax.Array:
    """HausdorffERLoss (hausdorff.py:83-173): iterative soft morphological erosion
    of the squared error, accumulated with (k+1)^alpha weights. The reference runs
    scipy convolve on CPU per step and is non-differentiable (numpy); here the
    whole loop is an unrolled XLA program and IS differentiable."""
    bound = ((pred - target) ** 2).astype(jnp.float32)          # (B, H, W)
    kernel = _CROSS.reshape(3, 3, 1, 1)
    eroted = jnp.zeros_like(bound)
    x = bound
    for k in range(erosions):
        d = jax.lax.conv_general_dilated(
            x[:, :, :, None], kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, :, :, 0]
        erosion = jnp.maximum(d - 0.5, 0.0)
        ptp = jnp.max(erosion, axis=(1, 2), keepdims=True) - jnp.min(erosion, axis=(1, 2), keepdims=True)
        norm = (erosion - jnp.min(erosion, axis=(1, 2), keepdims=True)) / jnp.where(ptp == 0, 1.0, ptp)
        erosion = jnp.where(ptp == 0, erosion, norm)
        x = erosion
        eroted = eroted + erosion * (k + 1) ** alpha
    return eroted.mean()
