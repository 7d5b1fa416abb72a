"""Mask-transformer (Segmenter) decode head + its transformer bricks.

Parity targets:
  * backbones/masktrans_block.py — FeedForward (:11-31), Attention (:34-72),
    pre-norm Block with return_attention hook (:75-90)
  * eval/eval_dinov2_masktrans.py:400-465 — MaskTransformer: project encoder
    tokens to d_model, append n_cls learned class embeddings, 2 transformer
    blocks, L2-normalized patch/class projections, masks = patches @ clsᵀ,
    LayerNorm over the class dim, reshape to (B, n_cls, GS, GS).
    Instantiated with d_model = d_encoder = n·E, n_heads = dim//64,
    d_ff = 4·dim (eval_dinov2_masktrans.py:136-139).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import trunc_normal_init

Dtype = Any


class MTAttention(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        B, N, C = x.shape
        H = self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, C // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (C // H) ** -0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        return out, attn


class MTBlock(nn.Module):
    heads: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_attention: bool = False):
        y, attn = MTAttention(self.heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        )
        if return_attention:
            return attn
        x = x + y
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(h)
        return x + h


class MaskTransformer(nn.Module):
    n_cls: int
    patch_size: int
    d_encoder: int
    n_layers: int = 2
    d_model: Optional[int] = None   # defaults to d_encoder (eval script :136-139)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, im_size: Tuple[int, int]) -> jax.Array:
        """tokens: (B, N, d_encoder) patch tokens; returns (B, GS, GS, n_cls)
        channel-last mask logits."""
        d = self.d_model or self.d_encoder
        heads = d // 64
        B = tokens.shape[0]
        H, W = im_size
        gs_h, gs_w = H // self.patch_size, W // self.patch_size

        x = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="proj_dec")(tokens)
        cls_emb = self.param("cls_emb", trunc_normal_init(0.02), (1, self.n_cls, d), jnp.float32)
        x = jnp.concatenate([x, jnp.broadcast_to(cls_emb.astype(x.dtype), (B, self.n_cls, d))], axis=1)
        for i in range(self.n_layers):
            x = MTBlock(heads, 4 * d, dtype=self.dtype, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="decoder_norm")(x)

        scale = d ** -0.5
        proj_patch = self.param("proj_patch", nn.initializers.normal(scale), (d, d), jnp.float32)
        proj_classes = self.param("proj_classes", nn.initializers.normal(scale), (d, d), jnp.float32)

        patches, cls_feat = x[:, : -self.n_cls], x[:, -self.n_cls :]
        patches = patches @ proj_patch.astype(x.dtype)
        cls_feat = cls_feat @ proj_classes.astype(x.dtype)
        patches = patches / jnp.linalg.norm(patches.astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)
        cls_feat = cls_feat / jnp.linalg.norm(cls_feat.astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)

        masks = jnp.einsum("bnd,bcd->bnc", patches, cls_feat)
        masks = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="mask_norm")(masks)
        return masks.reshape(B, gs_h, gs_w, self.n_cls)
