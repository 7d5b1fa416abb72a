"""Exact 2-D Euclidean distance transform on device.

The reference calls scipy.ndimage.distance_transform_edt on CPU *inside loss
forwards* (segloss/hausdorff.py:36-38, segloss/boundary_loss.py:164-190) — a
host-device sync per step. Here the EDT runs in XLA with the classic separable
squared-distance algorithm (Felzenszwalb & Huttenlocher):

  pass 1 (per row): nearest-background distance along x via two cumulative scans
          (cummax of background indices), g = d², O(n)
  pass 2 (per column): EDT²(y,x) = min_y' ( g(y',x) + (y-y')² ), a min-plus
          contraction evaluated in row chunks to bound memory.

Exact (not an approximation) and fully jittable with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def _row_dist_to_bg(bg: jax.Array) -> jax.Array:
    """Per-row distance along the last axis to the nearest True in `bg`.

    bg: (..., W) bool. Returns float32 distances (_BIG where the row has no bg).
    """
    W = bg.shape[-1]
    ax = bg.ndim - 1
    idx = jnp.arange(W, dtype=jnp.float32)
    fwd_src = jnp.where(bg, idx, -_BIG)
    fwd = jax.lax.cummax(fwd_src, axis=ax)          # nearest bg index to the left
    bwd_src = jnp.where(bg, idx, _BIG)
    bwd = -jax.lax.cummax(-bwd_src[..., ::-1], axis=ax)[..., ::-1]  # to the right
    return jnp.minimum(idx - fwd, bwd - idx)


def edt(mask: jax.Array, chunk: int = 64) -> jax.Array:
    """scipy.ndimage.distance_transform_edt semantics: for each True pixel of
    `mask`, the euclidean distance to the nearest False pixel; 0 on False pixels.

    mask: (B, H, W) bool. Returns (B, H, W) float32.
    """
    bg = ~mask
    d1 = _row_dist_to_bg(bg)                        # (B, H, W), may be _BIG
    g = jnp.minimum(d1 * d1, _BIG)                  # squared row distance

    B, H, W = mask.shape
    ys = jnp.arange(H, dtype=jnp.float32)

    def min_plus_chunk(y0: jax.Array) -> jax.Array:
        yq = y0 + jnp.arange(chunk, dtype=jnp.float32)          # (chunk,)
        dy2 = (yq[:, None] - ys[None, :]) ** 2                   # (chunk, H)
        # out[b, i, x] = min_y ( g[b, y, x] + dy2[i, y] )
        return jnp.min(g[:, None, :, :] + dy2[None, :, :, None], axis=2)

    n_chunks = -(-H // chunk)
    starts = jnp.arange(n_chunks, dtype=jnp.float32) * chunk
    out = jax.lax.map(min_plus_chunk, starts)                    # (n_chunks, B, chunk, W)
    out = jnp.moveaxis(out, 0, 1).reshape(B, n_chunks * chunk, W)[:, :H]
    out = jnp.sqrt(jnp.minimum(out, _BIG))
    return jnp.where(mask, out, 0.0)


def edt_signed_pair(mask: jax.Array) -> jax.Array:
    """posdist + negdist, the Hausdorff-DT 'distance field'
    (segloss/hausdorff.py:28-39, boundary_loss.py:164-170)."""
    return edt(mask) + edt(~mask)


def penalized_distance_map(gt: jax.Array, eps: float = 1e-12) -> jax.Array:
    """compute_edts_forPenalizedLoss (segloss/boundary_loss.py:174-186): inverted,
    per-image max-normalized distance maps of fg and bg. gt: (B, H, W) bool."""
    pos = edt(gt)
    neg = edt(~gt)
    pos_max = jnp.max(pos, axis=(1, 2), keepdims=True)
    neg_max = jnp.max(neg, axis=(1, 2), keepdims=True)
    pos_i = (pos_max - pos) * gt.astype(jnp.float32)
    neg_i = (neg_max - neg) * (~gt).astype(jnp.float32)
    # NOTE the reference rebinds pos_edt before taking the normalizing max
    # (boundary_loss.py:179-185) — it divides by max of the *inverted* masked map.
    pos_i_max = jnp.max(pos_i, axis=(1, 2), keepdims=True)
    neg_i_max = jnp.max(neg_i, axis=(1, 2), keepdims=True)
    return pos_i / jnp.maximum(pos_i_max, eps) + neg_i / jnp.maximum(neg_i_max, eps)
