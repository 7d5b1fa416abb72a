"""On-device CLAHE (Contrast Limited Adaptive Histogram Equalization).

Reproduces albumentations A.CLAHE(clip_limit=4.0, tile_grid_size=(8,8))
(reference pipeline train.py:160): for RGB input, convert to LAB, run cv2-style
CLAHE on the L channel, convert back.

cv2 CLAHE semantics implemented (all static shapes, XLA-friendly):
  * image padded to a tile multiple with BORDER_REFLECT_101
  * per-tile 256-bin histogram (scatter-add), clip at
    max(int(clip*tileArea/256), 1), excess redistributed: floor(excess/256) to all
    bins + residual dripped at stride max(256//residual, 1)
  * LUT = round(cdf * 255/tileArea); output bilinearly interpolates the 4
    neighboring tile LUTs per pixel.

This was a "hard part" in SURVEY.md §7 — histogram + cumsum per tile + bilinear
tile interpolation expressed as gathers; no host round-trip (the reference runs
this on CPU workers per image).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as _np

# D65 sRGB↔XYZ (OpenCV constants). Plain numpy at module scope — creating jnp
# arrays at import time would initialize a jax backend just by importing the data
# package (breaks pure-host tools like the offline converters).
_RGB2XYZ = _np.asarray(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]], _np.float32
)
_XYZ2RGB = _np.linalg.inv(_RGB2XYZ).astype(_np.float32)
_WHITE = _np.asarray([0.950456, 1.0, 1.088754], _np.float32)


def _f_lab(t):
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def _linear_to_srgb(x):
    x = jnp.maximum(x, 0.0)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)


def rgb_to_lab(rgb01: jax.Array) -> jax.Array:
    """float RGB in [0,1] → (L in [0,100], a/b unshifted). cv2 8U Lab applies sRGB
    gamma linearization first (verified in tests vs cv2.cvtColor)."""
    rgb01 = _srgb_to_linear(rgb01)
    xyz = jnp.einsum("...c,kc->...k", rgb01, _RGB2XYZ) / _WHITE
    fx, fy, fz = _f_lab(xyz[..., 0]), _f_lab(xyz[..., 1]), _f_lab(xyz[..., 2])
    y = xyz[..., 1]
    L = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_rgb(lab: jax.Array) -> jax.Array:
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def inv_f(f):
        t3 = f**3
        return jnp.where(t3 > 0.008856, t3, (f - 16.0 / 116.0) / 7.787)

    y = jnp.where(L > 903.3 * 0.008856, fy**3, L / 903.3)
    xyz = jnp.stack([inv_f(fx), y, inv_f(fz)], axis=-1) * _WHITE
    rgb = jnp.einsum("...k,ck->...c", xyz, _XYZ2RGB)
    return jnp.clip(_linear_to_srgb(rgb), 0.0, 1.0)


def _reflect101_pad(x: jax.Array, ph: int, pw: int) -> jax.Array:
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")


def clahe_channel(img: jax.Array, clip_limit=4.0, tiles: int = 8) -> jax.Array:
    """CLAHE on a single uint8 channel (H, W) → uint8. `clip_limit` may be a
    traced scalar — it only enters the clip threshold arithmetic."""
    H, W = img.shape
    if H % tiles == 0 and W % tiles == 0:
        pad_h = pad_w = 0
    else:
        # cv2 quirk: when ANY dim is non-divisible, BOTH dims get
        # `tiles - (dim % tiles)` of padding — a full extra tile-row/col when the
        # dim was already divisible (OpenCV clahe.cpp copyMakeBorder call).
        pad_h = tiles - (H % tiles)
        pad_w = tiles - (W % tiles)
    th = (H + pad_h) // tiles
    tw = (W + pad_w) // tiles
    x = _reflect101_pad(img, pad_h, pad_w)
    area = th * tw
    T = tiles * tiles

    # per-tile histograms: compare-and-reduce (fuses into one VPU loop — a
    # scatter-add formulation serializes on TPU and costs seconds per batch)
    tiled = x.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3).reshape(T, area)
    bins = jnp.arange(256, dtype=jnp.int32)
    hist = jnp.sum(
        (tiled.astype(jnp.int32)[:, :, None] == bins[None, None, :]).astype(jnp.float32),
        axis=1,
    )

    # clip + redistribute (cv2 semantics, integer arithmetic in float)
    clip = jnp.maximum(jnp.floor(clip_limit * area / 256.0), 1.0)
    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped, axis=1, keepdims=True)          # (T, 1)
    redist = jnp.floor(excess / 256.0)
    residual = excess - redist * 256.0
    clipped = clipped + redist
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    i = jnp.arange(256, dtype=jnp.float32)[None, :]
    drip = ((jnp.mod(i, step) == 0) & (i / step < residual)).astype(jnp.float32)
    clipped = clipped + drip

    # LUT per tile
    cdf = jnp.cumsum(clipped, axis=1)
    lut = jnp.clip(jnp.round(cdf * (255.0 / area)), 0, 255)         # (T, 256)
    lut = lut.reshape(tiles, tiles, 256)

    # bilinear interpolation of the 4 neighboring tile LUTs
    Hp, Wp = x.shape
    ty = jnp.arange(Hp, dtype=jnp.float32) / th - 0.5
    tx = jnp.arange(Wp, dtype=jnp.float32) / tw - 0.5
    ty0 = jnp.floor(ty)
    tx0 = jnp.floor(tx)
    ay = (ty - ty0)[:, None]
    ax = (tx - tx0)[None, :]
    y0 = jnp.clip(ty0, 0, tiles - 1).astype(jnp.int32)
    y1 = jnp.clip(ty0 + 1, 0, tiles - 1).astype(jnp.int32)
    x0 = jnp.clip(tx0, 0, tiles - 1).astype(jnp.int32)
    x1 = jnp.clip(tx0 + 1, 0, tiles - 1).astype(jnp.int32)

    v = x.astype(jnp.int32)
    w4 = jnp.stack([(1 - ay) * (1 - ax), (1 - ay) * ax, ay * (1 - ax), ay * ax])

    if th % 2 == 0 and tw % 2 == 0:
        # Quadrant-grouped one-hot matmul LUT application. Within one quadrant
        # of a tile, floor(y/th - .5) / floor(x/tw - .5) are CONSTANT, so each
        # (tile, quadrant) block reads the same 4 neighbour LUTs — the
        # per-pixel lookup becomes onehot(v) @ lut4, an exact bf16 MXU contract
        # (one-hot rows; LUT entries ≤ 255 are bf16-exact). The generic
        # flattened-LUT gather this replaces ran at ~150 ms/batch on v5e.
        th2, tw2 = th // 2, tw // 2
        npix = th2 * tw2

        def to_blocks(arr):
            a = arr.reshape(tiles, 2, th2, tiles, 2, tw2)
            return a.transpose(0, 1, 3, 4, 2, 5).reshape(4 * T, npix)

        vg = to_blocks(v)
        ty_b = _np.arange(tiles).repeat(2)                   # tile idx per (ty, sy)
        sy_b = _np.tile(_np.arange(2), tiles)
        n0 = _np.clip(ty_b - 1 + sy_b, 0, tiles - 1)         # floor neighbour
        n1 = _np.clip(ty_b + sy_b, 0, tiles - 1)
        blk_y0 = _np.repeat(n0, 2 * tiles)
        blk_y1 = _np.repeat(n1, 2 * tiles)
        blk_x0 = _np.tile(n0, 2 * tiles)
        blk_x1 = _np.tile(n1, 2 * tiles)
        neigh = _np.stack([
            blk_y0 * tiles + blk_x0, blk_y0 * tiles + blk_x1,
            blk_y1 * tiles + blk_x0, blk_y1 * tiles + blk_x1,
        ], axis=1)                                            # (4T, 4) static
        lut4 = lut.reshape(T, 256)[jnp.asarray(neigh)]        # (4T, 4, 256)
        onehot = (vg[:, :, None] == jnp.arange(256, dtype=jnp.int32)
                  ).astype(jnp.bfloat16)                      # (4T, npix, 256)
        vals_b = jnp.einsum("gpb,gkb->kgp", onehot,
                            lut4.astype(jnp.bfloat16)).astype(jnp.float32)
        wg = jax.vmap(to_blocks)(jnp.broadcast_to(w4, (4, Hp, Wp)))
        out_b = (vals_b * wg).sum(0)                          # (4T, npix)
        out = out_b.reshape(tiles, 2, tiles, 2, th2, tw2)
        out = out.transpose(0, 1, 4, 2, 3, 5).reshape(Hp, Wp)
    else:
        # odd tile dims: flattened-LUT gather fallback
        lut_flat = lut.reshape(T * 256)
        tile_idx = jnp.stack([
            y0[:, None] * tiles + x0[None, :],
            y0[:, None] * tiles + x1[None, :],
            y1[:, None] * tiles + x0[None, :],
            y1[:, None] * tiles + x1[None, :],
        ])                                                   # (4, Hp, Wp)
        vals = jnp.take(lut_flat, tile_idx * 256 + v[None], axis=0)
        out = (vals * w4).sum(0)
    out = jnp.round(out).astype(jnp.uint8)
    return out[:H, :W]


@partial(jax.jit, static_argnames=("tiles",))
def clahe_rgb(images: jax.Array, clip_limit=4.0, tiles: int = 8) -> jax.Array:
    """Batched uint8 RGB (B, H, W, 3) → CLAHE-on-L uint8 RGB (albumentations
    A.CLAHE semantics for color images). `clip_limit` is a scalar or per-image
    (B,) array — albumentations samples it U(1, clip_limit) per application
    (A.CLAHE(clip_limit=4.0) → uniform (1, 4))."""
    B = images.shape[0]
    clip_limit = jnp.broadcast_to(jnp.asarray(clip_limit, jnp.float32), (B,))
    rgb01 = images.astype(jnp.float32) / 255.0
    lab = rgb_to_lab(rgb01)
    L8 = jnp.round(jnp.clip(lab[..., 0] * 255.0 / 100.0, 0, 255)).astype(jnp.uint8)
    L8_eq = jax.vmap(lambda im, cl: clahe_channel(im, cl, tiles))(L8, clip_limit)
    L_new = L8_eq.astype(jnp.float32) * 100.0 / 255.0
    lab_new = jnp.stack([L_new, lab[..., 1], lab[..., 2]], axis=-1)
    rgb = lab_to_rgb(lab_new)
    return jnp.round(rgb * 255.0).astype(jnp.uint8)
