"""Linear/DPT decode heads for segmentation & depth probing
(reference: dinov2/eval/segmentation/ + dinov2/eval/depth/).

  * BNHead — resize-concat features → BatchNorm → 1×1 conv classifier; the linear
    seg/depth probe (segmentation/models/decode_heads/linear_head.py:15+,
    depth/models/decode_heads/linear_head.py)
  * ReassembleBlocks / PreActResidualConvUnit / FeatureFusionBlock / DPTHead —
    the DPT depth decoder (depth/models/decode_heads/dpt_head.py:47-270)
  * sig_loss / gradient_loss — scale-invariant depth loss + multi-scale gradient
    matching (depth/models/losses/sigloss.py, gradientloss.py)
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear

Dtype = Any


class BNHead(nn.Module):
    """resize-concat of tap features (+ optional cls-token broadcast) → 1-D BN
    ('SyncBN' = global batch under GSPMD) → 1×1 conv to classes/depth bins."""

    num_classes: int = 2
    use_cls_token: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps, train: bool = False) -> jax.Array:
        """taps: list of ((B, H, W, C) patch maps, (B, C) cls) or maps only."""
        maps = []
        for t in taps:
            if isinstance(t, (tuple, list)):
                patch, cls = t
                if self.use_cls_token:
                    cls_b = jnp.broadcast_to(cls[:, None, None, :], patch.shape)
                    patch = jnp.concatenate([patch, cls_b], axis=-1)
            else:
                patch = t
            maps.append(patch)
        target_hw = maps[0].shape[1:3]
        maps = [m if m.shape[1:3] == target_hw else resize_bilinear(m, target_hw)
                for m in maps]
        x = jnp.concatenate(maps, axis=-1)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_seg")(x)


class ReassembleBlocks(nn.Module):
    """Token maps → multi-scale pyramid via per-stage conv/deconv, with cls-token
    readout projection (dpt_head.py:47-123)."""

    embed_dim: int = 768
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = "project"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps) -> List[jax.Array]:
        outs = []
        for i, (patch, cls) in enumerate(taps):
            x = patch
            if self.readout_type == "project":
                readout = jnp.broadcast_to(cls[:, None, None, :], x.shape)
                x = jnp.concatenate([x, readout], axis=-1)
                x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"readout_{i}")(x)
                x = jax.nn.gelu(x, approximate=False)
            x = nn.Conv(self.post_process_channels[i], (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"proj_{i}")(x)
            # stage scaling: 4x up, 2x up, identity, 2x down (dpt_head.py:86-104)
            H, W = x.shape[1:3]
            if i == 0:
                x = nn.ConvTranspose(x.shape[-1], (4, 4), strides=(4, 4),
                                     dtype=self.dtype, param_dtype=jnp.float32,
                                     name="up4")(x)
            elif i == 1:
                x = nn.ConvTranspose(x.shape[-1], (2, 2), strides=(2, 2),
                                     dtype=self.dtype, param_dtype=jnp.float32,
                                     name="up2")(x)
            elif i == 3:
                x = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32, name="down2")(x)
            outs.append(x)
        return outs


class PreActResidualConvUnit(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.relu(x)
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip=None, train: bool = False) -> jax.Array:
        if skip is not None:
            x = x + PreActResidualConvUnit(self.channels, dtype=self.dtype,
                                           name="res1")(skip, train)
        x = PreActResidualConvUnit(self.channels, dtype=self.dtype, name="res2")(x, train)
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="project")(x)


class DPTHead(nn.Module):
    """DPT depth head (dpt_head.py:213-270): reassemble → per-stage 3×3 convs →
    top-down feature fusion → depth regression conv stack."""

    embed_dim: int = 768
    channels: int = 256
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    min_depth: float = 0.001
    max_depth: float = 10.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps, train: bool = False) -> jax.Array:
        feats = ReassembleBlocks(self.embed_dim, self.post_process_channels,
                                 dtype=self.dtype, name="reassemble")(taps)
        feats = [
            nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"conv_{i}")(f)
            for i, f in enumerate(feats)
        ]
        x = FeatureFusionBlock(self.channels, dtype=self.dtype, name="fusion_3")(
            feats[3], None, train)
        for i in (2, 1, 0):
            # upsampled deeper stream fused with the shallower stage
            if x.shape[1:3] != feats[i].shape[1:3]:
                x = resize_bilinear(x, feats[i].shape[1:3], align_corners=True)
            x = FeatureFusionBlock(self.channels, dtype=self.dtype, name=f"fusion_{i}")(
                feats[i], x, train)
        x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="project")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_depth")(x)
        return jax.nn.sigmoid(x) * (self.max_depth - self.min_depth) + self.min_depth


def sig_loss(pred: jax.Array, target: jax.Array, valid_mask=None,
             sigma: float = 0.85, eps: float = 0.001) -> jax.Array:
    """Scale-invariant log loss (depth/models/losses/sigloss.py:13+)."""
    if valid_mask is None:
        valid_mask = target > eps
    m = valid_mask.astype(jnp.float32)
    g = (jnp.log(jnp.clip(pred, eps)) - jnp.log(jnp.clip(target, eps))) * m
    n = jnp.maximum(m.sum(), 1.0)
    return jnp.sqrt(jnp.clip((g ** 2).sum() / n - sigma * (g.sum() / n) ** 2, 0.0))


def gradient_loss(pred: jax.Array, target: jax.Array, scales: int = 4,
                  eps: float = 0.001) -> jax.Array:
    """Multi-scale gradient matching (depth/models/losses/gradientloss.py)."""
    total = 0.0
    lp = jnp.log(jnp.clip(pred, eps))
    lt = jnp.log(jnp.clip(target, eps))
    diff = lp - lt
    for s in range(scales):
        step = 2 ** s
        d = diff[:, ::step, ::step]
        m = (target[:, ::step, ::step] > eps).astype(jnp.float32)
        gx = jnp.abs(jnp.diff(d, axis=2)) * m[:, :, 1:] * m[:, :, :-1]
        gy = jnp.abs(jnp.diff(d, axis=1)) * m[:, 1:, :] * m[:, :-1, :]
        n = jnp.maximum(m.sum(), 1.0)
        total = total + (gx.sum() + gy.sum()) / n
    return total
