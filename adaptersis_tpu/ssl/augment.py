"""DINO multi-crop augmentation, on device
(reference: dinov2/data/augmentations.py:19-118 DataAugmentationDINO).

Pipeline per image: 2 global crops (random-resized-crop scale (0.32, 1.0) → S_g,
hflip p=.5, color jitter p=.8, grayscale p=.2, gaussian blur [p=1.0 / p=.1],
solarize p=.2 on crop 2) + n local crops (scale (0.05, 0.32) → S_l, same
photometric minus solarize). ImageNet mean/std normalization
(dinov2/data/transforms.py:42-43).

TPU formulation: crop+resize as dynamically-built interpolation-MATRIX matmuls
and blur as banded-matrix matmuls (9-tap separable gaussian; sigma∈[0.1,2]
drawn per torchvision). Dynamic-index gathers and vmapped jnp.convolve both
lower pathologically on TPU — this module once cost 355 s per batch; as
matmuls it is milliseconds (same lesson as ops/resize.py / data/clahe.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import apply_interp, interp_matrix_bilinear

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _rrc_coords(key, H, W, out: int, scale: Tuple[float, float], ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop parameter sampling (area scale + log ratio)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = H * W * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    w = jnp.clip(jnp.sqrt(area * r), 8.0, W)
    h = jnp.clip(jnp.sqrt(area / r), 8.0, H)
    y0 = jax.random.uniform(k3, ()) * (H - h)
    x0 = jax.random.uniform(k4, ()) * (W - w)
    return y0, x0, h, w


def _crop_resize(img, y0, x0, h, w, out):
    ys = y0 + (jnp.arange(out) + 0.5) * h / out - 0.5
    xs = x0 + (jnp.arange(out) + 0.5) * w / out - 0.5
    My = interp_matrix_bilinear(ys, img.shape[0])
    Mx = interp_matrix_bilinear(xs, img.shape[1])
    return apply_interp(apply_interp(img, My, 0), Mx, 1)


def _color_jitter(key, img):  # img in [0,1]
    kb, kc, ks, kh, kp, kg = jax.random.split(key, 6)
    do = jax.random.bernoulli(kp, 0.8)
    b = 1 + jax.random.uniform(kb, (), minval=-0.4, maxval=0.4)
    c = 1 + jax.random.uniform(kc, (), minval=-0.4, maxval=0.4)
    s = 1 + jax.random.uniform(ks, (), minval=-0.2, maxval=0.2)
    out = jnp.clip(img * b, 0, 1)
    mean = out.mean()
    out = jnp.clip((out - mean) * c + mean, 0, 1)
    gray = out @ jnp.asarray([0.299, 0.587, 0.114])
    out = jnp.clip((out - gray[..., None]) * s + gray[..., None], 0, 1)
    img = jnp.where(do, out, img)
    # grayscale p=.2
    g = img @ jnp.asarray([0.299, 0.587, 0.114])
    img = jnp.where(jax.random.bernoulli(kg, 0.2), g[..., None].repeat(3, -1), img)
    return img


def _blur_matrix(k, r: int, S: int):
    """(S, S) banded gaussian matrix: M[o, i] = k[i−o+r], zero-padded borders
    (jnp.convolve mode="same" semantics)."""
    d = jnp.arange(S)[None, :] - jnp.arange(S)[:, None]     # i − o
    M = jnp.zeros((S, S), jnp.float32)
    for t in range(2 * r + 1):
        M = M + jnp.where(d == t - r, k[t], 0.0)
    return M


def _gaussian_blur(key, img, p: float):
    kp, ks = jax.random.split(key)
    sigma = jax.random.uniform(ks, (), minval=0.1, maxval=2.0)
    r = 4
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / k.sum()
    out = apply_interp(img, _blur_matrix(k, r, img.shape[0]), 0)
    out = apply_interp(out, _blur_matrix(k, r, img.shape[1]), 1)
    return jnp.where(jax.random.bernoulli(kp, p), out, img)


def _solarize(key, img, p: float = 0.2, threshold: float = 0.5):
    do = jax.random.bernoulli(key, p)
    return jnp.where(do, jnp.where(img >= threshold, 1.0 - img, img), img)


def _normalize(img):
    return (img - IMAGENET_MEAN) / IMAGENET_STD


@partial(jax.jit, static_argnames=("global_size", "local_size", "n_local",
                                   "global_scale", "local_scale"))
def multicrop_augment(images_u8: jax.Array, rng: jax.Array, global_size: int = 224,
                      local_size: int = 96, n_local: int = 8,
                      global_scale=(0.32, 1.0), local_scale=(0.05, 0.32)):
    """(B, H, W, 3) uint8 → (2B, Sg, Sg, 3), (n_local·B, Sl, Sl, 3) normalized."""
    B, H, W, _ = images_u8.shape
    imgs = images_u8.astype(jnp.float32) / 255.0

    def one_crop(img, key, out, scale, blur_p, solarize_p):
        kc, kf, kj, kb, ks = jax.random.split(key, 5)
        y0, x0, h, w = _rrc_coords(kc, H, W, out, scale)
        c = _crop_resize(img, y0, x0, h, w, out)
        c = jnp.where(jax.random.bernoulli(kf, 0.5), c[:, ::-1], c)
        c = _color_jitter(kj, c)
        c = _gaussian_blur(kb, c, blur_p)
        c = _solarize(ks, c, solarize_p)
        return _normalize(c)

    keys = jax.random.split(rng, B * (2 + n_local)).reshape(B, 2 + n_local, 2)

    g1 = jax.vmap(lambda im, k: one_crop(im, k, global_size, global_scale, 1.0, 0.0))(
        imgs, keys[:, 0])
    g2 = jax.vmap(lambda im, k: one_crop(im, k, global_size, global_scale, 0.1, 0.2))(
        imgs, keys[:, 1])
    global_crops = jnp.concatenate([g1, g2], axis=0)

    locals_ = [
        jax.vmap(lambda im, k: one_crop(im, k, local_size, local_scale, 0.5, 0.0))(
            imgs, keys[:, 2 + i])
        for i in range(n_local)
    ]
    local_crops = jnp.concatenate(locals_, axis=0) if n_local else jnp.zeros((0, local_size, local_size, 3))
    return global_crops, local_crops
