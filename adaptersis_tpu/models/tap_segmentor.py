"""TapSegmentor — the family of adapter-free eval-script models: frozen-backbone
feature taps decoded by a variant head (reference eval/ directory, SURVEY §2.2).

Variants (decoder=):
  * "setr"      — eval_dinov2_setr.py: concat last-n patch tokens (n·E ch) →
                  Decoder2D conv-up ×4 (== DecoderSETR) (:281-287, 368-404)
  * "unet"      — eval_dinov2_unet.py: last-block tokens → truncated feature-space
                  UNet (:367-399)
  * "unet_fuse" — eval_dinov2_or_unet_fuse.py: full-image UNet with the last-block
                  tap of THREE backbone passes at scales (1.0, 1.5, 0.5) fused
                  (FCUUp project + add + ReLU) into encoder stages 1-3
                  (:279-308, 426-509)
  * "masktrans" — eval_dinov2_masktrans.py: concat last-n → MaskTransformer
                  Segmenter head (:400-465)
  * "setr_ete"  — eval_dinov2_setr_cross_ete.py: x_norm_patchtokens of the FULL
                  forward → small DecoderSETR(256,128,64); backbone TRAINED
                  end-to-end (:146-148, 308, 321-328)

All return logits bilinearly resized to the input resolution (each script's
F.interpolate(..., mode='bilinear') before the loss).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .decoders import DecoderSETR, FCUUp
from .masktrans import MaskTransformer
from .unet_parts import DoubleConv, Down, FeatureUNet, OutConv, Up
from .vit import DinoVisionTransformer

Dtype = Any

sg = jax.lax.stop_gradient


class UNetFuse(nn.Module):
    """Full-image UNet with multi-scale ViT fusion at stages 1-3
    (eval_dinov2_or_unet_fuse.py:420-509). FusionModel there is add+ReLU."""

    n_classes: int = 2
    embed_dim: int = 384
    bilinear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, tap_o, tap_t2, tap_d2, train: bool = False):
        factor = 2 if self.bilinear else 1

        def fuse(stage, tap, out_ch, name):
            t = FCUUp(out_ch, up_stride=1, dtype=self.dtype, name=name)(
                tap, stage.shape[1], stage.shape[2], train
            )
            return nn.relu(stage + t)

        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(x, train)
        x1 = fuse(x1, tap_t2, 64, "expand_block_4")
        x2 = Down(128, dtype=self.dtype, name="down1")(x1, train)
        x2 = fuse(x2, tap_o, 128, "expand_block_3")
        x3 = Down(256, dtype=self.dtype, name="down2")(x2, train)
        x3 = fuse(x3, tap_d2, 256, "expand_block_2")
        x4 = Down(512, dtype=self.dtype, name="down3")(x3, train)
        x5 = Down(1024 // factor, dtype=self.dtype, name="down4")(x4, train)
        h = Up(512 // factor, self.bilinear, dtype=self.dtype, name="up1")(x5, x4, train)
        h = Up(256 // factor, self.bilinear, dtype=self.dtype, name="up2")(h, x3, train)
        h = Up(128 // factor, self.bilinear, dtype=self.dtype, name="up3")(h, x2, train)
        h = Up(64, self.bilinear, dtype=self.dtype, name="up4")(h, x1, train)
        return OutConv(self.n_classes, dtype=self.dtype, name="outc")(h)


class TapSegmentor(nn.Module):
    backbone: DinoVisionTransformer
    num_classes: int = 2
    n_last_blocks: int = 4
    decoder: str = "setr"
    train_backbone: bool = False  # True only for "setr_ete"
    dtype: Dtype = jnp.float32

    def _taps(self, x: jax.Array, n: int):
        taps = self.backbone.get_intermediate_layers(x, n=n, norm=True)
        if not self.train_backbone:
            taps = [sg(t) for t in taps]
        return taps

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, _ = x.shape
        p = self.backbone.patch_size
        E = self.backbone.embed_dim
        gh, gw = H // p, W // p

        def to_map(t, h_=gh, w_=gw):
            return t.reshape(B, h_, w_, t.shape[-1])

        if self.decoder == "setr":
            feat = to_map(jnp.concatenate(self._taps(x, self.n_last_blocks), axis=-1))
            logits = DecoderSETR(self.num_classes, dtype=self.dtype, name="head")(feat, train)
        elif self.decoder == "unet":
            feat = to_map(self._taps(x, 1)[-1])
            logits = FeatureUNet(self.num_classes, in_channels=E, dtype=self.dtype,
                                 name="head")(feat, train)
        elif self.decoder == "masktrans":
            tokens = jnp.concatenate(self._taps(x, self.n_last_blocks), axis=-1)
            logits = MaskTransformer(
                self.num_classes, p, d_encoder=self.n_last_blocks * E,
                dtype=self.dtype, name="head",
            )(tokens, (H, W))
        elif self.decoder == "unet_fuse":
            # three frozen backbone passes at scales 1.0 / 1.5 / 0.5 (:279-308)
            x_t2 = resize_bilinear(x, (H * 3 // 2, W * 3 // 2), align_corners=False)
            x_d2 = resize_bilinear(x, (H // 2, W // 2), align_corners=False)
            tap_o = to_map(self._taps(x, 1)[-1])
            tap_t2 = to_map(self._taps(x_t2, 1)[-1], H * 3 // (2 * p), W * 3 // (2 * p))
            tap_d2 = to_map(self._taps(x_d2, 1)[-1], H // (2 * p), W // (2 * p))
            logits = UNetFuse(self.num_classes, embed_dim=E, dtype=self.dtype,
                              name="head")(x, tap_o, tap_t2, tap_d2, train)
        elif self.decoder == "setr_ete":
            out = self.backbone(x)
            tokens = out["x_norm_patchtokens"]
            logits = DecoderSETR(self.num_classes, features=(256, 128, 64),
                                 dtype=self.dtype, name="head")(to_map(tokens), train)
        else:
            raise ValueError(f"unknown tap decoder {self.decoder!r}")

        return resize_bilinear(logits.astype(jnp.float32), (H, W), align_corners=False)
