"""Depth estimation encoder-decoder (reference:
dinov2/eval/depth/models/depther/encoder_decoder.py:35-236).

DepthEncoderDecoder: frozen backbone taps → BNHead or DPTHead; whole-image or
sliding-window inference with overlap-count normalization; SigLoss (+ optional
multi-scale gradient loss) training objective.
"""

from __future__ import annotations

from typing import Any, Literal, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .heads import BNHead, DPTHead, gradient_loss, sig_loss
from .vit import DinoVisionTransformer

Dtype = Any

sg = jax.lax.stop_gradient


class DepthEncoderDecoder(nn.Module):
    backbone: DinoVisionTransformer
    head: str = "linear"          # "linear" (BNHead) | "dpt"
    n_last_blocks: int = 4
    min_depth: float = 0.001
    max_depth: float = 10.0
    n_bins: int = 256             # linear head regresses binned depth (BNHead depth probe)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, _ = x.shape
        p = self.backbone.patch_size
        taps = self.backbone.get_intermediate_layers(
            x, n=self.n_last_blocks, return_class_token=True, norm=True)
        taps = [(sg(t[0]).reshape(B, H // p, W // p, -1), sg(t[1])) for t in taps]
        if self.head == "dpt":
            depth = DPTHead(embed_dim=self.backbone.embed_dim,
                            min_depth=self.min_depth, max_depth=self.max_depth,
                            dtype=self.dtype, name="decode_head")(taps, train)
        else:
            logits = BNHead(num_classes=self.n_bins, dtype=self.dtype,
                            name="decode_head")(taps, train)
            # binned depth: softmax over uniform bin centers (the linear depth
            # probe's classification-as-regression scheme)
            centers = jnp.linspace(self.min_depth, self.max_depth, self.n_bins)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            depth = (probs * centers).sum(-1, keepdims=True)
        return resize_bilinear(depth.astype(jnp.float32), (H, W), align_corners=False)

    def loss(self, pred: jax.Array, target: jax.Array,
             grad_weight: float = 0.5) -> jax.Array:
        return sig_loss(pred[..., 0], target) + grad_weight * gradient_loss(pred[..., 0], target)
