"""Focal loss with label smoothing (reference: /root/reference/segloss/focal_loss.py:7-91)."""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp


def focal_loss(
    probs: jax.Array,                 # (B, H, W, C) — reference expects a nonlin already applied
    labels: jax.Array,                # (B, H, W) int
    alpha: Optional[Union[float, Sequence[float]]] = None,
    gamma: float = 2.0,
    balance_index: int = 0,
    smooth: float = 1e-5,
    size_average: bool = True,
) -> jax.Array:
    C = probs.shape[-1]
    p = probs.reshape(-1, C).astype(jnp.float32)
    lab = labels.reshape(-1).astype(jnp.int32)

    if alpha is None:
        a = jnp.ones((C,), jnp.float32)
    elif isinstance(alpha, (list, tuple)):
        a = jnp.asarray(alpha, jnp.float32)
        a = a / a.sum()
    elif isinstance(alpha, float):
        a = jnp.full((C,), 1 - alpha, jnp.float32).at[balance_index].set(alpha)
    else:
        raise TypeError(f"unsupported alpha type {type(alpha)}")

    one_hot = jax.nn.one_hot(lab, C, dtype=jnp.float32)
    if smooth:
        one_hot = jnp.clip(one_hot, smooth / (C - 1), 1.0 - smooth)
    pt = (one_hot * p).sum(-1) + smooth
    logpt = jnp.log(pt)
    loss = -a[lab] * jnp.power(1 - pt, gamma) * logpt
    return loss.mean() if size_average else loss.sum()
