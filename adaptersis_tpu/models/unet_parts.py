"""UNet building blocks (reference: /root/reference/backbones/unet_parts.py).

DoubleConv (:6-23), Down (:26-37), Up with pad-to-match + skip concat (:40-66),
Up_wc no-skip variant (:68-94), OutConv (:97-103), and the truncated feature-space
UNet (:106-138). NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import upsample2x

Dtype = Any


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mid = self.mid_channels or self.out_channels
        for i, ch in enumerate([mid, self.out_channels]):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"conv{i+1}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, param_dtype=jnp.float32, name=f"bn{i+1}")(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_channels, dtype=self.dtype, name="conv")(x, train)


class Up(nn.Module):
    """2× upsample, center-pad to skip's size, concat skip, DoubleConv (:40-66)."""

    out_channels: int
    bilinear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool = False) -> jax.Array:
        if self.bilinear:
            x = upsample2x(x, align_corners=True)
            conv = DoubleConv(self.out_channels, mid_channels=x.shape[-1] // 2,
                              dtype=self.dtype, name="conv")
        else:
            x = nn.ConvTranspose(x.shape[-1] // 2, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, param_dtype=jnp.float32, name="up")(x)
            conv = DoubleConv(self.out_channels, dtype=self.dtype, name="conv")
        dy = skip.shape[1] - x.shape[1]
        dx = skip.shape[2] - x.shape[2]
        x = jnp.pad(x, ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)))
        return conv(jnp.concatenate([skip, x], axis=-1), train)


class UpWC(nn.Module):
    """No-skip up block Up_wc (:68-94)."""

    out_channels: int
    bilinear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.bilinear:
            x = upsample2x(x, align_corners=True)
            return DoubleConv(self.out_channels, mid_channels=x.shape[-1] // 2,
                              dtype=self.dtype, name="conv")(x, train)
        x = nn.ConvTranspose(x.shape[-1] // 2, (2, 2), strides=(2, 2),
                             dtype=self.dtype, param_dtype=jnp.float32, name="up")(x)
        return DoubleConv(self.out_channels, dtype=self.dtype, name="conv")(x, train)


class FeatureUNet(nn.Module):
    """Truncated feature-space UNet on ViT tokens (reference unet_parts.py:106-138,
    embedded in eval/eval_dinov2_unet.py:367-399): 384 → down3/down4 → up with
    skips → 2 no-skip ups → OutConv. Output at 4× the input grid."""

    n_classes: int = 2
    in_channels: int = 384
    bilinear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        factor = 2 if self.bilinear else 1
        c = self.in_channels
        x3 = x
        x4 = Down(2 * c, dtype=self.dtype, name="down3")(x3, train)
        x5 = Down(4 * c // factor, dtype=self.dtype, name="down4")(x4, train)
        h = Up(2 * c // factor, self.bilinear, dtype=self.dtype, name="up1")(x5, x4, train)
        h = Up(c // factor, self.bilinear, dtype=self.dtype, name="up2")(h, x3, train)
        h = UpWC(c // 2 // factor, self.bilinear, dtype=self.dtype, name="up3")(h, train)
        h = UpWC(c // 4, self.bilinear, dtype=self.dtype, name="up4")(h, train)
        return OutConv(self.n_classes, dtype=self.dtype, name="outc")(h)


class OutConv(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)
