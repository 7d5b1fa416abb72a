"""On-device training augmentations, fused into the jitted train step.

Replaces the reference's CPU albumentations pipeline (train.py:139-163):
  OneOf[RandomSizedCrop(min_max=(294,588)→588, p=.5), PadIfNeeded(588)] p=1
  → HorizontalFlip p=.5 → RandomRotate90 p=.5
  → (Elastic/Grid/Optical p=0 — DISABLED in the reference, not implemented)
  → CLAHE p=.8 → RandomBrightnessContrast p=.8 → RandomGamma p=.8
Val: Resize(588, BICUBIC) only, no normalization (train.py:119-122) — images are
just /255 (tools/dataset.py:146).

TPU formulation: dynamic crop sizes are hostile to XLA, so RandomSizedCrop is a
*coordinate-remap gather* (crop+resize in one bilinear sample, static shapes).
Rotate90 is a 4-way lax.switch per sample. Everything is batched with one fused
program; input uint8 HWC, output float32 in [0,1].

Numerics: albumentations applies photometric ops through uint8 LUTs; we compute in
float and round back to uint8 between stages, which matches to ±1/255.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import apply_interp, interp_matrix_bilinear, interp_matrix_nearest
from .clahe import clahe_rgb


def _crop_resize_bilinear(img: jax.Array, y0, x0, size, out: int) -> jax.Array:
    """Sample an (size×size) crop at (y0, x0) resized to (out×out), half-pixel
    bilinear (cv2 INTER_LINEAR semantics). img: (H, W, C) float32.

    Crop offsets/sizes are traced per sample, so the crop+resize is ONE pair of
    dynamically-built interpolation-matrix matmuls (TPU major-axis gathers are
    ~1000× slower than MXU contractions — see ops/resize.py)."""
    H, W, _ = img.shape
    scale = size / out
    coords = (jnp.arange(out, dtype=jnp.float32) + 0.5) * scale - 0.5
    My = interp_matrix_bilinear(coords + y0, H)
    Mx = interp_matrix_bilinear(coords + x0, W)
    return apply_interp(apply_interp(img, My, 0), Mx, 1)


def _crop_resize_nearest(mask: jax.Array, y0, x0, size, out: int) -> jax.Array:
    H, W = mask.shape
    scale = size / out
    coords = jnp.floor((jnp.arange(out, dtype=jnp.float32) + 0.5) * scale)
    ys = jnp.clip(coords + y0, 0, H - 1).astype(jnp.int32)
    xs = jnp.clip(coords + x0, 0, W - 1).astype(jnp.int32)
    m = mask.astype(jnp.float32)
    m = apply_interp(apply_interp(m, interp_matrix_nearest(ys, H), 0),
                     interp_matrix_nearest(xs, W), 1)
    return jnp.round(m).astype(mask.dtype)


def _rot90_k(img: jax.Array, k: jax.Array) -> jax.Array:
    """jnp.rot90 with traced k via lax.switch (square spatial dims)."""
    fns = [
        lambda a: a,
        lambda a: jnp.rot90(a, 1, axes=(0, 1)),
        lambda a: jnp.rot90(a, 2, axes=(0, 1)),
        lambda a: jnp.rot90(a, 3, axes=(0, 1)),
    ]
    return jax.lax.switch(k, fns, img)


def train_augment(
    images: jax.Array,           # (B, S, S, 3) uint8
    masks: jax.Array,            # (B, S, S) int
    rng: jax.Array,
    crop_min_frac: float = 0.5,  # A.RandomSizedCrop(min_max_height=(0.5*S, S))
    use_clahe: bool = True,
    clahe_p: float = 0.8,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (float32 images in [0,1], int32 masks)."""
    B, S = images.shape[0], images.shape[1]
    keys = jax.random.split(rng, 10)

    def per_sample_geom(img_u8, mask, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        img = img_u8.astype(jnp.float32)
        # --- OneOf[RandomSizedCrop p=.5 | PadIfNeeded p=.5] (identity at full size)
        do_crop = jax.random.bernoulli(k1, 0.5)
        size = jax.random.randint(k2, (), int(S * crop_min_frac), S + 1).astype(jnp.float32)
        size = jnp.where(do_crop, size, float(S))
        max_off = jnp.maximum(S - size, 0.0)
        y0 = jax.random.uniform(k3, ()) * max_off
        x0 = jax.random.uniform(k4, ()) * max_off
        img = _crop_resize_bilinear(img, y0, x0, size, S)
        mask = _crop_resize_nearest(mask, y0, x0, size, S)
        # --- HorizontalFlip p=.5 + RandomRotate90 p=.5 (k ~ U{0..3} when applied)
        kf, kr, kp = jax.random.split(k5, 3)
        flip = jax.random.bernoulli(kf, 0.5)
        img = jnp.where(flip, img[:, ::-1], img)
        mask = jnp.where(flip, mask[:, ::-1], mask)
        k90 = jnp.where(jax.random.bernoulli(kp, 0.5), jax.random.randint(kr, (), 0, 4), 0)
        img = _rot90_k(img, k90)
        mask = _rot90_k(mask, k90)
        return jnp.round(jnp.clip(img, 0, 255)).astype(jnp.uint8), mask

    geom_keys = jax.random.split(keys[0], B)
    images, masks = jax.vmap(per_sample_geom)(images, masks, geom_keys)

    # --- CLAHE p=.8 (uint8 LAB-L, clip ~ U(1,4) per image, 8×8 tiles) ---
    # albumentations A.CLAHE(clip_limit=4.0) samples clip uniformly from (1, 4)
    # on every application, not a fixed 4.0
    if use_clahe:
        do = jax.random.bernoulli(keys[1], clahe_p, (B,))
        clip = jax.random.uniform(keys[7], (B,), minval=1.0, maxval=4.0)
        eq = clahe_rgb(images, clip)
        images = jnp.where(do[:, None, None, None], eq, images)

    img_f = images.astype(jnp.float32)

    # --- RandomBrightnessContrast p=.8 (limits ±0.2, brightness_by_max=True) ---
    do = jax.random.bernoulli(keys[2], 0.8, (B, 1, 1, 1))
    alpha = 1.0 + jax.random.uniform(keys[3], (B, 1, 1, 1), minval=-0.2, maxval=0.2)
    beta = jax.random.uniform(keys[4], (B, 1, 1, 1), minval=-0.2, maxval=0.2)
    bc = jnp.clip(img_f * alpha + beta * 255.0, 0, 255)
    img_f = jnp.where(do, bc, img_f)

    # --- RandomGamma p=.8 (gamma_limit (80, 120)) ---
    do = jax.random.bernoulli(keys[5], 0.8, (B, 1, 1, 1))
    gamma = jax.random.uniform(keys[6], (B, 1, 1, 1), minval=0.8, maxval=1.2)
    gm = jnp.power(jnp.clip(img_f / 255.0, 0.0, 1.0), gamma) * 255.0
    img_f = jnp.where(do, gm, img_f)

    img_f = jnp.round(jnp.clip(img_f, 0, 255))
    return img_f / 255.0, masks.astype(jnp.int32)


def val_preprocess(images: jax.Array) -> jax.Array:
    """uint8 → float32 /255, NO normalization (reference val path, train.py:119-122)."""
    return images.astype(jnp.float32) / 255.0


# ImageNet statistics (torchvision convention, used by the masktrans variant)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def apply_input_norm(x01: jax.Array, mode: str) -> jax.Array:
    """Per-variant input normalization applied AFTER the /255 pipeline.

    "imagenet_div255" reproduces eval_dinov2_masktrans.py exactly: the torch
    transform normalizes with ImageNet mean/std (:144-154, :171-175) and the
    Robomis dataset then divides the *normalized* tensor by 255 again (:74-75)
    — a reference quirk kept for parity. All other variants feed /255 only
    ("none"; eval_dinov2_masktrans_inov.py:89,172 has Normalize commented out).
    """
    if mode == "none":
        return x01
    if mode == "imagenet_div255":
        mean = jnp.asarray(IMAGENET_MEAN, x01.dtype)
        std = jnp.asarray(IMAGENET_STD, x01.dtype)
        return ((x01 - mean) / std) / 255.0
    raise ValueError(f"unknown input_norm mode {mode!r}")
