"""Deformable cross-attention adapter blocks (the paper's core novel modules).

Parity targets (reference: /root/reference/backbones/adapter_blocks.py):
  * get_reference_points (:9-22) — normalized cell-center grids per level
  * deform_inputs (:24-38) — two ref-point/shape sets: ViT-query→CNN-3-level and
    CNN-query→ViT-1-level
  * DWConv (:62-80) — depthwise 3×3 applied per pyramid level of the token sequence.
    The reference hard-codes the level split with `n = 18*18` (588px assumption,
    SURVEY.md §2.12 bug 6); we derive the split from the actual static level shapes,
    which is identical at 588px and correct everywhere else.
  * ConvFFN (:82-100), CACNN (:102-147), CAViT (:149-183) — gated residual deformable
    cross-attention in both directions (ViT-Adapter Injector/Extractor lineage).

All shapes are static: reference points / spatial shapes are computed at trace time
with numpy, so each (imsize, patch) pair compiles once.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.ms_deform_attn import MSDeformAttn

Dtype = Any


def get_reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Normalized cell-center grid, concatenated over levels → (1, sum(HW), 1, 2).

    Reference: adapter_blocks.py:9-22 (linspace(0.5, H-0.5, H)/H cell centers).
    """
    pts = []
    for H, W in spatial_shapes:
        ys = (np.arange(H, dtype=np.float32) + 0.5) / H
        xs = (np.arange(W, dtype=np.float32) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, 0)[None, :, None, :]
    return ref.astype(np.float32)


def deform_inputs(h: int, w: int, patch_size: int):
    """Static deformable-attention geometry for an (h, w) input.

    Returns (d1, d2) where each is (reference_points, spatial_shapes):
      d1: ViT tokens query the 3-level CNN pyramid (adapter_blocks.py:26-31)
      d2: CNN pyramid tokens query the single-level ViT grid (:33-36)

    NOTE: the reference assumes the encoder pyramid is exactly (h//8, h//16, h//32),
    which only holds for sizes like 588 (MSDeformAttn asserts otherwise,
    ms_deform_attn.py:150). The segmentor instead uses `adapter_geometry` with the
    encoder's *actual* static shapes — identical at 588, correct everywhere.
    """
    cnn_shapes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
    vit_shapes = [(h // patch_size, w // patch_size)]
    return adapter_geometry(vit_shapes[0], cnn_shapes)


def adapter_geometry(vit_hw: Tuple[int, int], cnn_shapes: Sequence[Tuple[int, int]]):
    """Deformable geometry from the actual (static) grids.

    d1: ViT-token queries → CNN pyramid levels; d2: CNN-token queries → ViT grid.
    """
    cnn_shapes = [tuple(s) for s in cnn_shapes]
    d1 = (jnp.asarray(get_reference_points([tuple(vit_hw)])), cnn_shapes)
    d2 = (jnp.asarray(get_reference_points(cnn_shapes)), [tuple(vit_hw)])
    return d1, d2


class DWConv(nn.Module):
    """Shared depthwise 3×3 conv applied to each pyramid level of a token sequence
    (adapter_blocks.py:62-80). `level_shapes` gives the static (H, W) of each level;
    the token sequence is split as [H0*W0, H1*W1, H2*W2]."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, level_shapes: Sequence[Tuple[int, int]]) -> jax.Array:
        B, N, C = x.shape
        assert sum(h * w for h, w in level_shapes) == N, (level_shapes, N)
        conv = nn.Conv(
            self.dim,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            feature_group_count=self.dim,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dwconv",
        )
        outs: List[jax.Array] = []
        start = 0
        for H, W in level_shapes:
            seg = jax.lax.dynamic_slice_in_dim(x, start, H * W, axis=1)
            seg = conv(seg.reshape(B, H, W, C)).reshape(B, H * W, C)
            outs.append(seg)
            start += H * W
        return jnp.concatenate(outs, axis=1)


class ConvFFN(nn.Module):
    """fc1 → per-level DWConv → GELU → fc2 (adapter_blocks.py:82-100)."""

    in_features: int
    hidden_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, level_shapes: Sequence[Tuple[int, int]]) -> jax.Array:
        x = nn.Dense(self.hidden_features, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = DWConv(self.hidden_features, dtype=self.dtype, name="dwconv")(x, level_shapes)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.in_features, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
        return x


class CAViT(nn.Module):
    """ViT tokens query the CNN pyramid; gated residual with learnable gamma
    (adapter_blocks.py:149-183; ViT-Adapter 'Injector'). gamma init 0.0 per
    train.py:90 — the adapter starts as an exact identity on the ViT stream."""

    dim: int
    num_heads: int = 8
    n_points: int = 4
    n_levels: int = 3
    deform_ratio: float = 1.0
    init_values: float = 0.0
    msda_impl: str = "gather"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                      # (B, Lq, C) ViT tokens
        reference_points: jax.Array,           # (1, Lq, 1, 2)
        feat: jax.Array,                       # (B, S, C) CNN pyramid tokens
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="query_norm")(query)
        f = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="feat_norm")(feat)
        ref = jnp.broadcast_to(
            reference_points.astype(jnp.float32),
            (query.shape[0], query.shape[1], self.n_levels, 2),
        )
        attn = MSDeformAttn(
            d_model=self.dim,
            n_levels=self.n_levels,
            n_heads=self.num_heads,
            n_points=self.n_points,
            ratio=self.deform_ratio,
            impl=self.msda_impl,
            dtype=self.dtype,
            name="attn",
        )(q, ref, f, spatial_shapes)
        gamma = self.param("gamma", nn.initializers.constant(self.init_values), (self.dim,), jnp.float32)
        return query + gamma.astype(query.dtype) * attn


class CACNN(nn.Module):
    """CNN pyramid tokens query the ViT grid, plus a ConvFFN refinement
    (adapter_blocks.py:102-147; ViT-Adapter 'Extractor')."""

    dim: int
    num_heads: int = 8
    n_points: int = 4
    n_levels: int = 1
    deform_ratio: float = 1.0
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    msda_impl: str = "gather"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                      # (B, S, C) CNN pyramid tokens
        reference_points: jax.Array,           # (1, S, 1, 2)
        feat: jax.Array,                       # (B, Lq, C) ViT tokens
        spatial_shapes: Sequence[Tuple[int, int]],   # ViT grid, single level
        query_level_shapes: Sequence[Tuple[int, int]],  # CNN pyramid levels for DWConv
    ) -> jax.Array:
        q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="query_norm")(query)
        f = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="feat_norm")(feat)
        ref = jnp.broadcast_to(
            reference_points.astype(jnp.float32),
            (query.shape[0], query.shape[1], self.n_levels, 2),
        )
        attn = MSDeformAttn(
            d_model=self.dim,
            n_levels=self.n_levels,
            n_heads=self.num_heads,
            n_points=self.n_points,
            ratio=self.deform_ratio,
            impl=self.msda_impl,
            dtype=self.dtype,
            name="attn",
        )(q, ref, f, spatial_shapes)
        query = query + attn
        if self.with_cffn:
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ffn_norm")(query)
            h = ConvFFN(
                self.dim, int(self.dim * self.cffn_ratio), dtype=self.dtype, name="ffn"
            )(h, query_level_shapes)
            query = query + h
        return query
