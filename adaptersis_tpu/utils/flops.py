"""Analytic FLOP count for the flagship adapter-segmentation train step.

Why analytic: XLA's compiled-program cost_analysis() reports flops=0 for
custom calls, and on this build the dominant matmuls live inside Pallas
kernels (flash attention, fused LN+QKV / LN+MLP, the MSDA kernels) — the
compiled count would miss most of the work. This module counts matmul/conv
MACs from the model geometry instead (2 flops per MAC), so the MFU
denominator in bench.py is hardware-anchored and impl-independent.

Deliberately conservative (undercounts): LayerNorm/softmax/GELU/elementwise,
the on-device augmentation pipeline, bilinear resizes, and the loss are all
ignored. Backward cost: trainable subgraphs (adapters, encoder, decoder)
count 3x forward (dX + dW); the frozen backbone walks count 1x — every
frozen-block application sits under stop_gradient (models/segmentor.py:22-27),
matching the reference's torch.no_grad walks (train.py:300-387).

Reference geometry being costed: /root/reference/train.py:268-428 (ViT-L/14,
588 px, 4 adapter rounds, FeatureDecoder), README.md:31-44.
"""

from __future__ import annotations

from typing import Tuple


def _conv2d(h: int, w: int, k: int, cin: int, cout: int) -> float:
    return 2.0 * h * w * k * k * cin * cout


def vit_block_flops(n_tokens: int, embed_dim: int, mlp_ratio: float = 4.0) -> float:
    """qkv + attention scores/values + out-proj + 2-layer MLP, per image."""
    e = embed_dim
    n = n_tokens
    matmuls = 2.0 * n * e * e * (3 + 1 + 2 * mlp_ratio)   # qkv, proj, fc1, fc2
    attention = 4.0 * n * n * e                           # q@k^T and attn@v
    return matmuls + attention


def msda_flops(lq: int, lv: int, embed_dim: int, heads: int = 8,
               levels: int = 3, points: int = 4) -> float:
    """One MSDeformAttn forward (ops/msda_pallas.py math; reference
    ms_deform_attn.py:33-54): value/offset/weight/output projections + the
    bilinear gather-reduce (4 corners + weight combine ~ 5 MACs per channel
    per sampling point)."""
    e = embed_dim
    d = e // heads
    proj = 2.0 * lv * e * e + 2.0 * lq * e * e
    offs = 2.0 * lq * e * (heads * levels * points * 3)   # offsets(2) + weights(1)
    gather = 2.0 * lq * heads * levels * points * 5 * d
    return proj + offs + gather


def adapter_round_flops(n_vit: int, n_cnn: int, embed_dim: int) -> float:
    """CAViT (ViT queries CNN 3-level pyramid) + CACNN (CNN queries ViT,
    1 level) + CACNN's ConvFFN at ratio 0.25 (adapter_blocks.py:82-147)."""
    cavit = msda_flops(n_vit, n_cnn, embed_dim, levels=3)
    cacnn = msda_flops(n_cnn, n_vit, embed_dim, levels=1)
    hidden = embed_dim // 4
    cffn = 2.0 * n_cnn * embed_dim * hidden * 2 + 2.0 * n_cnn * 9 * hidden
    return cavit + cacnn + cffn


def encoder_flops(imsize: int, inplanes: int = 64, embed_dim: int = 1024) -> float:
    """FeatureEncoder conv pyramid (models/encoders.py:60-95) at the actual
    reference grid arithmetic (73/36/18 at 588)."""
    p = inplanes
    h2 = (imsize + 1) // 2                 # stem s2 p1
    h4 = (h2 + 1) // 2                     # maxpool s2 p1
    h8 = (h4 - 1) // 2                     # conv2 s2 VALID
    h16 = (h8 - 1) // 2                    # conv3 s2 VALID
    h32 = (h16 + 1) // 2                   # conv4 s2 p1
    f = _conv2d(h2, h2, 3, 3, p) + 2 * _conv2d(h2, h2, 3, p, p)
    f += _conv2d(h8, h8, 3, p, 2 * p) + _conv2d(h16, h16, 3, 2 * p, 4 * p)
    f += _conv2d(h32, h32, 3, 4 * p, 8 * p)
    f += _conv2d(h4, h4, 1, p, embed_dim) + _conv2d(h8, h8, 1, 2 * p, embed_dim)
    f += _conv2d(h16, h16, 1, 4 * p, embed_dim) + _conv2d(h32, h32, 1, 8 * p, embed_dim)
    return f


def decoder_flops(hp: int, wp: int, embed_dim: int, num_classes: int = 2,
                  features: Tuple[int, ...] = (1024, 512, 256, 128, 64)) -> float:
    """FeatureDecoder (models/decoders.py:50-62): 3x3 conv then 2x up, x4."""
    cin = 3 * embed_dim
    h, w = hp, wp
    f = 0.0
    for cout in features[1:]:
        f += _conv2d(h, w, 3, cin, cout)
        cin = cout
        h, w = 2 * h, 2 * w
    return f + _conv2d(h, w, 3, cin, num_classes)


def train_step_flops(batch: int, imsize: int = 588, patch: int = 14,
                     embed_dim: int = 1024, depth: int = 24,
                     n_last_blocks: int = 4, num_classes: int = 2) -> float:
    """Total FLOPs of one fused train step (bench.py geometry).

    Frozen walks (fwd-only): the clean tap walk runs all `depth` blocks, the
    adapter re-walk runs depth-(n-1) prefix blocks + (n-1) interleaved blocks
    = depth again (segmentor.py:129-208) -> 2*depth block applications at the
    flash-padded token count. Trainable parts (adapters x n rounds, encoder,
    decoder) count fwd+bwd = 3x.
    """
    hp = wp = imsize // patch
    n_vit = hp * wp                              # adapter stream (no cls)
    n_pad = -(-(n_vit + 1) // 128) * 128         # padded walk length (pad_walks)
    enc = encoder_flops(imsize, embed_dim=embed_dim)
    h8 = ((((imsize + 1) // 2 + 1) // 2) - 1) // 2
    h16 = (h8 - 1) // 2
    h32 = (h16 + 1) // 2
    n_cnn = h8 * h8 + h16 * h16 + h32 * h32
    patch_embed = 2.0 * n_vit * (patch * patch * 3) * embed_dim

    frozen = 2 * depth * vit_block_flops(n_pad, embed_dim) + 2 * patch_embed
    adapters = n_last_blocks * adapter_round_flops(n_vit, n_cnn, embed_dim)
    dec = decoder_flops(hp, wp, embed_dim, num_classes)

    per_image = frozen + 3.0 * (adapters + enc + dec)
    return batch * per_image
