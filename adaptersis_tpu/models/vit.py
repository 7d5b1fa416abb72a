"""DINOv2 Vision Transformer backbone in Flax (TPU-first rebuild).

Parity targets (reference: /root/reference/dinov2/models/vision_transformer.py):
  * cls token + learned pos embed with bicubic interpolation to arbitrary
    resolution (:164-188). The reference's "+0.1" scale-factor fudge only exists to
    make torch's floor(size*scale) land on the right integer; jax.image.resize takes
    the output shape directly so the fudge is unnecessary — same target grid.
  * get_intermediate_layers(x, n, reshape, return_class_token, norm) (:263-287):
    outputs of the last n blocks, optionally final-LayerNormed; this is the feature
    tap every trainer builds on (dinov2/eval/utils.py:30-44).
  * factories vit_small(384/12/6), vit_base(768/12/12), vit_large(1024/24/16),
    vit_giant2(1536/40/24, SwiGLU fused) (:305-357); DINOv2 uses patch 14,
    img_size 518 → 37×37 pos grid (dinov2/configs/*_pretrain.yaml).

TPU deltas: NHWC input, static shapes per (imsize, arch) jit cache, fine-grained
`embed`/`run_blocks`/`final_norm` methods so the adapter segmentor can interleave
adapter blocks between the last ViT blocks *inside one XLA program* (the reference
walks the backbone twice per step, train.py:287-301).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bicubic
from .layers import Block, PatchEmbed, layer_norm, trunc_normal_init

Dtype = Any


class DinoVisionTransformer(nn.Module):
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ffn_layer: str = "mlp"
    init_values: float = 1e-5
    num_register_tokens: int = 0
    # "einsum" | "flash" (tuned Pallas flash kernel — faster & O(N) memory at
    # the flagship 1765-token sequence; see layers._sdpa_flash)
    attn_impl: str = "einsum"
    # per-block windowed-attention flags — the m2f windowed-ViT backbone
    # (segmentation_m2f/models/backbones/vit.py:440-455: scalar or list)
    window_attn: Optional[Sequence[bool]] = None
    window_size: int = 14
    gelu_approx: bool = False    # tanh GELU (layers.Mlp) — TPU perf opt-in
    # "xla" | "pallas" — fused one-pass LayerNorm kernel (ops/layernorm.py);
    # the frozen walks apply ~100 LNs/step, each ~1.2 ms as XLA convert_reduce
    # fusions at the flagship (28672, 1024) shape vs ~0.15 ms HBM-bound
    ln_impl: str = "xla"
    # "xla" | "pallas" — one fused kernel for the block's whole MLP half
    # (ops/fused_mlp.py); requires gelu_approx, ffn "mlp" and LayerScale
    mlp_impl: str = "xla"
    # "xla" | "pallas" — fused LN1+qkv+head-split kernel emitting q/k/v in
    # the flash layout (ops/fused_qkv.py); requires attn_impl="flash"
    qkv_impl: str = "xla"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        self.cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32)
        self.mask_token = self.param("mask_token", nn.initializers.zeros, (1, self.embed_dim), jnp.float32)
        n_base = (self.img_size // self.patch_size) ** 2
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_init(0.02), (1, n_base + 1, self.embed_dim), jnp.float32
        )
        if self.num_register_tokens:
            self.register_tokens = self.param(
                "register_tokens", nn.initializers.zeros, (1, self.num_register_tokens, self.embed_dim), jnp.float32
            )
        wa = self.window_attn or [False] * self.depth
        self.blocks = [
            Block(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.init_values,
                self.ffn_layer,
                attn_impl=self.attn_impl,
                windowed=bool(wa[i]),
                window_size=self.window_size,
                gelu_approx=self.gelu_approx,
                ln_impl=self.ln_impl,
                mlp_impl=self.mlp_impl,
                qkv_impl=self.qkv_impl,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm = layer_norm(self.ln_impl, self.dtype, "norm")

    # ---- pieces (used by the adapter segmentor to build one fused program) ----

    def interpolate_pos_encoding(self, hp: int, wp: int) -> jax.Array:
        """Bicubic-resize the patch pos-embed grid to (hp, wp). Returns (1, 1+hp*wp, C).

        Reference: dinov2/models/vision_transformer.py:164-188.
        """
        pe = self.pos_embed.astype(jnp.float32)
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        m = int(round(patch_pe.shape[1] ** 0.5))
        if (hp, wp) == (m, m):
            return pe
        grid = patch_pe.reshape(1, m, m, self.embed_dim)
        # torch bicubic kernel (a=-0.75) AND the reference's scale-factor fudge
        # sx=(hp+0.1)/m (vision_transformer.py:164-188) — both shift numerics and
        # are required for checkpoint parity at non-native resolutions
        grid = resize_bicubic(grid, (hp, wp), scales=((hp + 0.1) / m, (wp + 0.1) / m))
        return jnp.concatenate([cls_pe, grid.reshape(1, hp * wp, self.embed_dim)], axis=1)

    def embed(self, x: jax.Array, with_pos_cls: bool = True,
              masks: Optional[jax.Array] = None) -> Tuple[jax.Array, Tuple[int, int]]:
        """Patch-embed NHWC input. with_pos_cls=False reproduces the reference's
        adapter re-walk, which runs `model.patch_embed(inp)` with *no* cls token and
        *no* positional embedding (train.py:300-301). `masks` (B, N) bool replaces
        masked patch tokens with the learned mask token BEFORE cls/pos — the iBOT
        substitution (vision_transformer.py:190-199)."""
        tokens, (hp, wp) = self.patch_embed(x)
        if masks is not None:
            tokens = jnp.where(masks[..., None], self.mask_token.astype(tokens.dtype), tokens)
        if not with_pos_cls:
            return tokens, (hp, wp)
        B = tokens.shape[0]
        cls = jnp.broadcast_to(self.cls_token.astype(tokens.dtype), (B, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + self.interpolate_pos_encoding(hp, wp).astype(tokens.dtype)
        if self.num_register_tokens:
            reg = jnp.broadcast_to(self.register_tokens.astype(tokens.dtype), (B, self.num_register_tokens, self.embed_dim))
            tokens = jnp.concatenate([tokens[:, :1], reg, tokens[:, 1:]], axis=1)
        return tokens, (hp, wp)

    def run_blocks(self, x: jax.Array, start: int, stop: int, remat: bool = False,
                   hw: Optional[Tuple[int, int]] = None,
                   segment_ids: Optional[jax.Array] = None) -> jax.Array:
        """Apply blocks[start:stop]. Python-level loop — XLA sees a flat program.
        `hw` is the patch-token grid, needed by windowed blocks; `segment_ids`
        restricts attention to the block-diagonal (packed crops)."""
        for blk in self.blocks[start:stop]:
            if remat:
                x = nn.remat(lambda m, y: m(y, hw=hw, segment_ids=segment_ids))(blk, x)
            else:
                x = blk(x, hw=hw, segment_ids=segment_ids)
        return x

    def forward_packed_crops(self, g: jax.Array, l: jax.Array,
                             masks: Optional[jax.Array] = None) -> Tuple[dict, dict]:
        """Mixed-resolution crop packing: ALL crops ride ONE attention call per
        block via segment ids — the TPU equivalent of the reference's
        NestedTensorBlock + fmha.BlockDiagonalMask joint global+local forward
        (dinov2/layers/block.py:161-260). Numerically identical to two separate
        forwards: each crop's tokens attend only within their own segment.

        g: (2B, Sg, Sg, 3) global crops (iBOT `masks` apply here);
        l: (k·2B, Sl, Sl, 3) local crops. Returns (global dict, local dict)
        with x_norm_clstoken / x_norm_patchtokens each."""
        tg, _ = self.embed(g, with_pos_cls=True, masks=masks)
        tl, _ = self.embed(l, with_pos_cls=True)
        B2, Ng, C = tg.shape
        nB, Nl, _ = tl.shape
        if nB % B2:
            raise ValueError(f"{nB} local crops not divisible by {B2} global rows")
        k = nB // B2
        x = jnp.concatenate([tg, tl.reshape(B2, k * Nl, C)], axis=1)
        seg = np.concatenate([np.zeros(Ng, np.int32)]
                             + [np.full(Nl, 1 + i, np.int32) for i in range(k)])
        seg = jnp.broadcast_to(jnp.asarray(seg)[None], (B2, x.shape[1]))
        x = self.run_blocks(x, 0, self.depth, segment_ids=seg)
        x = self.final_norm(x)
        xg = x[:, :Ng]
        xl = x[:, Ng:].reshape(nB, Nl, C)
        r = self.num_register_tokens
        return ({"x_norm_clstoken": xg[:, 0], "x_norm_patchtokens": xg[:, 1 + r:]},
                {"x_norm_clstoken": xl[:, 0], "x_norm_patchtokens": xl[:, 1 + r:]})

    def collect_block_outputs(self, x: jax.Array, taps: Sequence[int], remat_untapped: bool = False,
                              hw: Optional[Tuple[int, int]] = None,
                              segment_ids: Optional[jax.Array] = None) -> List[jax.Array]:
        """Run all blocks, returning the (un-normed) outputs of block indices `taps`."""
        out = []
        want = set(taps)
        for i, blk in enumerate(self.blocks):
            if remat_untapped and i not in want:
                x = nn.remat(lambda m, y: m(y, hw=hw, segment_ids=segment_ids))(blk, x)
            else:
                x = blk(x, hw=hw, segment_ids=segment_ids)
            if i in want:
                out.append(x)
        return out

    def final_norm(self, x: jax.Array) -> jax.Array:
        return self.norm(x)

    def get_last_selfattention(self, x: jax.Array) -> jax.Array:
        """Attention probabilities of the last block, (B, heads, N, N) — the DINO
        attention-visualization hook (root vision_transformer.py:80-92,225-232)."""
        tokens, hw = self.embed(x, with_pos_cls=True)
        tokens = self.run_blocks(tokens, 0, self.depth - 1, hw=hw)
        return self.blocks[-1](tokens, return_attention=True)

    # ---- public forward APIs ----

    def __call__(self, x: jax.Array) -> dict:
        """Full forward. Returns the reference's output dict fields
        (dinov2/models/vision_transformer.py:201-218)."""
        return self.forward_with_masks(x, masks=None)

    def forward_with_masks(self, x: jax.Array, masks: Optional[jax.Array] = None) -> dict:
        tokens, hw = self.embed(x, with_pos_cls=True, masks=masks)
        tokens = self.run_blocks(tokens, 0, self.depth, hw=hw)
        normed = self.final_norm(tokens)
        r = self.num_register_tokens
        return {
            "x_norm_clstoken": normed[:, 0],
            "x_norm_regtokens": normed[:, 1 : 1 + r],
            "x_norm_patchtokens": normed[:, 1 + r :],
            "x_prenorm": tokens,
        }

    def get_intermediate_layers(
        self,
        x: jax.Array,
        n: int = 1,
        reshape: bool = False,
        return_class_token: bool = False,
        norm: bool = True,
    ):
        """Last-n block outputs, the universal feature tap
        (dinov2/models/vision_transformer.py:263-287)."""
        tokens, (hp, wp) = self.embed(x, with_pos_cls=True)
        taps = list(range(self.depth - n, self.depth))
        outs = self.collect_block_outputs(tokens, taps, hw=(hp, wp))
        if norm:
            outs = [self.final_norm(o) for o in outs]
        r = self.num_register_tokens
        cls_toks = [o[:, 0] for o in outs]
        patch_toks = [o[:, 1 + r :] for o in outs]
        if reshape:
            B = x.shape[0]
            patch_toks = [p.reshape(B, hp, wp, self.embed_dim) for p in patch_toks]
        if return_class_token:
            return tuple(zip(patch_toks, cls_toks))
        return tuple(patch_toks)


class DinoV1VisionTransformer(DinoVisionTransformer):
    """EXACT DINO-v1 ViT semantics (reference root vision_transformer.py:134-256),
    as a configuration of the shared block stack:

      * no LayerScale (construct with init_values=None — v1 blocks have none)
      * `__call__` returns the final-normed PATCH tokens, cls dropped (:219-224)
      * `get_intermediate_layers(x, n)` returns the last-n blocks' FULL normed
        token sequences INCLUDING cls (:236-244 — DINOv2 strips cls, v1 keeps)
      * same "+0.1" bicubic pos-embed fudge (:176-196; shared implementation)

    Init delta (documented): v1 trunc-normal-inits the cls token (:163); ours
    keeps the dinov2 zero-ish init — irrelevant under weight transplant, which
    is the only v1 use on the reference main path."""

    def __call__(self, x: jax.Array) -> jax.Array:
        tokens, hw = self.embed(x, with_pos_cls=True)
        tokens = self.run_blocks(tokens, 0, self.depth, hw=hw)
        return self.final_norm(tokens)[:, 1:]

    def get_intermediate_layers(self, x: jax.Array, n: int = 1, **_):
        tokens, hw = self.embed(x, with_pos_cls=True)
        outs = self.collect_block_outputs(tokens, list(range(self.depth - n, self.depth)), hw=hw)
        return [self.final_norm(o) for o in outs]


# ---- factories (dinov2/models/vision_transformer.py:305-357) ----

def vit_small(**kw) -> DinoVisionTransformer:
    return DinoVisionTransformer(embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(**kw) -> DinoVisionTransformer:
    return DinoVisionTransformer(embed_dim=768, depth=12, num_heads=12, **kw)


def vit_large(**kw) -> DinoVisionTransformer:
    return DinoVisionTransformer(embed_dim=1024, depth=24, num_heads=16, **kw)


def vit_giant2(**kw) -> DinoVisionTransformer:
    return DinoVisionTransformer(embed_dim=1536, depth=40, num_heads=24, ffn_layer="swiglufused", **kw)


def _quarter_global_windows(depth: int) -> tuple:
    """ViT-Adapter-style schedule: windowed attention everywhere except the
    last block of each quarter (the interaction-stage boundaries), which stays
    global — the pattern the m2f windowed backbone is configured with
    (segmentation_m2f/models/backbones/vit.py:453: per-block window_attn list)."""
    q = depth // 4
    return tuple((i + 1) % q != 0 for i in range(depth))


def _windowed(factory, depth):
    return lambda **kw: factory(window_attn=_quarter_global_windows(depth), **kw)


ARCHS = {
    "vit_small": vit_small,
    # tiny config for integration/smoke tests (not a reference arch)
    "vit_test": partial(DinoVisionTransformer, embed_dim=64, depth=5, num_heads=4),
    "vit_base": vit_base,
    "vit_large": vit_large,
    "vit_giant2": vit_giant2,
    # DINO-v1 aliases accepted by the reference CLI (--arch vit_small/vit_base)
    "vit_tiny": partial(DinoVisionTransformer, embed_dim=192, depth=12, num_heads=3),
    # exact DINO-v1 modules (root vision_transformer.py:246-268 factories)
    "vit_tiny_v1": partial(DinoV1VisionTransformer, embed_dim=192, depth=12,
                           num_heads=3, init_values=None),
    "vit_small_v1": partial(DinoV1VisionTransformer, embed_dim=384, depth=12,
                            num_heads=6, init_values=None),
    "vit_base_v1": partial(DinoV1VisionTransformer, embed_dim=768, depth=12,
                           num_heads=12, init_values=None),
    # m2f windowed backbones (windowed attention, global at quarter boundaries)
    "vit_small_windowed": _windowed(vit_small, 12),
    "vit_base_windowed": _windowed(vit_base, 12),
    "vit_large_windowed": _windowed(vit_large, 24),
    "vit_giant2_windowed": _windowed(vit_giant2, 40),
}


def build_backbone(arch: str, img_size: int = 518, patch_size: int = 14, dtype: Dtype = jnp.float32, **kw) -> DinoVisionTransformer:
    if arch not in ARCHS:
        raise ValueError(f"unknown arch {arch!r}; choose from {sorted(ARCHS)}")
    return ARCHS[arch](img_size=img_size, patch_size=patch_size, dtype=dtype, **kw)
