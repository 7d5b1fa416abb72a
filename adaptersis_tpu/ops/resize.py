"""Image resize ops matching torch.nn.functional.interpolate semantics.

The reference mixes align_corners conventions (SURVEY.md §7 "hard parts"):
  * nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True) in every decoder
    (backbones/decoders.py:113,174-193)
  * F.interpolate(..., mode='bilinear') (align_corners=False) for the final logit
    upsample (train.py:422) and FCUUp (decoders.py:295 — nearest, actually: mode
    default is 'nearest' there)
  * bicubic for pos-embed interpolation (vit.py handles that via jax.image.resize).

Implementation: separable 1-D interpolation MATRICES contracted on the MXU
(out = M_y · x · M_xᵀ). TPU gathers along a major axis run ~1000× slower than
lane-axis ops (see ops/ms_deform_attn.py), so every resize here is a dense
one-hot-weight matmul instead of a take(): the matrices are built with iota
compares (clamped taps accumulate onto the boundary row, matching torch's
coordinate clamping) and XLA constant-folds them for static sizes. torch
semantics: source coordinates are clamped to the valid range (no zero padding),
keeping the fractional weight from the unclamped coordinate.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _axis_coords(in_size: int, out_size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.linspace(0.0, in_size - 1, out_size, dtype=jnp.float32)
    scale = in_size / out_size
    return (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5


def interp_matrix_bilinear(src: jax.Array, in_size: int) -> jax.Array:
    """(out, in) bilinear interpolation matrix for (possibly traced) source
    coordinates `src`, torch clamping semantics. Two weights per row; clamped
    corner taps accumulate onto the boundary column."""
    src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    t = src - i0.astype(jnp.float32)
    iota = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    return (jnp.where(iota == i0[:, None], 1.0 - t[:, None], 0.0)
            + jnp.where(iota == i1[:, None], t[:, None], 0.0))


def interp_matrix_nearest(idx: jax.Array, in_size: int) -> jax.Array:
    """(out, in) one-hot row-selection matrix."""
    iota = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    return (iota == idx[:, None]).astype(jnp.float32)


def apply_interp(x: jax.Array, M: jax.Array, axis: int) -> jax.Array:
    """Contract interpolation matrix M (out, in) against `axis` of x on the MXU."""
    nd = x.ndim
    # HIGHEST precision: TPU f32 matmuls otherwise decompose to bf16 passes,
    # costing ~1e-3 relative error on interpolation weights
    y = jax.lax.dot_general(
        x, M.astype(x.dtype),
        dimension_numbers=(((axis,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype)
    # contracted axis is removed, matrix `out` dim appended last — restore order
    perm = list(range(nd - 1))
    perm.insert(axis, nd - 1)
    return y.transpose(perm)


def _lerp_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    M = interp_matrix_bilinear(_axis_coords(in_size, out_size, align_corners), in_size)
    return apply_interp(x, M, axis)


def resize_bilinear(x: jax.Array, size: Tuple[int, int], align_corners: bool = False) -> jax.Array:
    """NHWC bilinear resize matching F.interpolate(mode='bilinear').

    Layout note (round-4 measured dead end, don't retry): deferring the two
    per-axis restore transposes into ONE trailing (B,C,H',W')→NHWC transpose
    — to kill the 5 ms relayout copy XLA materializes between the decoder's
    last 672² upsample and the trailing conv (copy.3889 in the round-4
    profile) — regressed the full step 20.23→20.17 img/s: XLA just moved the
    relayout elsewhere and the conv lost its preferred input layout. The
    chained per-axis form below is the measured-best arrangement."""
    out = _lerp_axis(x, 1, size[0], align_corners)
    out = _lerp_axis(out, 2, size[1], align_corners)
    return out


def _cubic_weights(t: jax.Array, a: float = -0.75):
    """Keys cubic convolution weights for taps at offsets (-1, 0, 1, 2) from the
    floor coordinate; a=-0.75 matches torch F.interpolate(mode='bicubic')."""
    # kernel W(x) for |x|<=1:  (a+2)|x|^3 - (a+3)|x|^2 + 1
    #            1<|x|<2:     a|x|^3 - 5a|x|^2 + 8a|x| - 4a
    def w1(d):  # |d| <= 1
        return ((a + 2) * d - (a + 3)) * d * d + 1
    def w2(d):  # 1 < |d| < 2
        return ((a * d - 5 * a) * d + 8 * a) * d - 4 * a
    return (w2(t + 1), w1(t), w1(1 - t), w2(2 - t))


def _cubic_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool,
                scale: float | None = None) -> jax.Array:
    in_size = x.shape[axis]
    if scale is not None:
        # torch F.interpolate(scale_factor=s) uses the *given* scale in the
        # coordinate transform: src = (dst + 0.5)/s - 0.5. DINOv2's "+0.1" pos-embed
        # fudge (vision_transformer.py:164-188) therefore shifts sampling coords.
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / scale - 0.5
    else:
        src = _axis_coords(in_size, out_size, align_corners)
    i1 = jnp.floor(src).astype(jnp.int32)
    t = src - i1.astype(jnp.float32)
    ws = _cubic_weights(t)
    iota = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    M = jnp.zeros((out_size, in_size), jnp.float32)
    for k, w in zip((-1, 0, 1, 2), ws):
        idx = jnp.clip(i1 + k, 0, in_size - 1)
        M = M + jnp.where(iota == idx[:, None], 1.0, 0.0) * w[:, None]
    return apply_interp(x, M, axis)


def resize_bicubic(x: jax.Array, size: Tuple[int, int], align_corners: bool = False,
                   scales: Tuple[float, float] | None = None) -> jax.Array:
    """NHWC bicubic resize matching torch F.interpolate(mode='bicubic') — used for
    DINOv2 pos-embed interpolation (dinov2/models/vision_transformer.py:164-188).
    `scales` reproduces scale_factor-mode coordinate mapping (the +0.1 fudge)."""
    out = _cubic_axis(x, 1, size[0], align_corners, scales[0] if scales else None)
    out = _cubic_axis(out, 2, size[1], align_corners, scales[1] if scales else None)
    return out


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """NHWC nearest resize matching F.interpolate(mode='nearest'):
    src = floor(dst * in/out)."""
    def idx(in_size, out_size):
        return jnp.minimum(
            (jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)).astype(jnp.int32),
            in_size - 1,
        )
    out = apply_interp(x, interp_matrix_nearest(idx(x.shape[1], size[0]), x.shape[1]), 1)
    return apply_interp(out, interp_matrix_nearest(idx(x.shape[2], size[1]), x.shape[2]), 2)


def upsample2x(x: jax.Array, align_corners: bool = True) -> jax.Array:
    """nn.Upsample(scale_factor=2, mode='bilinear') as used by all decoders."""
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=align_corners)


def center_pad(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """F.pad(x, [dx//2, dx-dx//2, dy//2, dy-dy//2]) in NHWC (train.py:402-405)."""
    dy = size[0] - x.shape[1]
    dx = size[1] - x.shape[2]
    return jnp.pad(
        x,
        ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
    )
