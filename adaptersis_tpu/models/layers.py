"""Core transformer layers for the DINOv2 backbone, TPU-first.

Behavioral parity targets (cited against the reference repo, /root/reference):
  * dinov2/layers/patch_embed.py:25-88  — conv patch embed, flatten to tokens
  * dinov2/layers/attention.py:36-69    — plain SDPA attention (qkv bias, proj)
  * dinov2/layers/mlp.py:16-40          — 2-layer GELU MLP
  * dinov2/layers/swiglu_ffn.py:54-72   — SwiGLUFFNFused, hidden = ceil(2/3*4d) to mult of 8
  * dinov2/layers/layer_scale.py:15-27  — LayerScale gamma multiply
  * dinov2/layers/block.py:43-114       — pre-norm block with LayerScale + DropPath

Design deltas (TPU-first, on purpose):
  * NHWC conv layout everywhere (XLA TPU native), tokens are (B, N, C).
  * computation dtype is configurable (bf16 on TPU), params stay fp32
    (mirrors the reference's AMP autocast boundary, dinov2/eval/setup.py:52-59).
  * attention uses a single fused einsum path that XLA maps onto the MXU;
    a Pallas flash-attention kernel can be swapped in via `attn_impl`.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.flash_fwd import flash_fwd
from ..ops.fused_mlp import fused_ln_mlp
from ..ops.fused_qkv import fused_ln_qkv
from ..ops.layernorm import fused_layernorm

Dtype = Any


class FusedLayerNorm(nn.Module):
    """Drop-in for nn.LayerNorm (same param tree: scale/bias fp32) backed by the
    one-pass Pallas kernel (ops/layernorm.py). Geometries the kernel can't tile
    (feature dim not a lane multiple) fall back to plain XLA math."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        x = x.astype(self.dtype)
        if C % 128 == 0:
            return fused_layernorm(x, scale, bias, self.epsilon)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


def layer_norm(ln_impl: str, dtype: Dtype, name: str,
               epsilon: float = 1e-6) -> nn.Module:
    """nn.LayerNorm or the fused Pallas kernel, same param tree either way."""
    if ln_impl == "pallas":
        return FusedLayerNorm(epsilon=epsilon, dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=epsilon, dtype=dtype, param_dtype=jnp.float32,
                        name=name)


def trunc_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


class PatchEmbed(nn.Module):
    """Image → token conv embed. Input NHWC, output (B, N, C) + (Hp, Wp) grid."""

    patch_size: int = 14
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
        B, H, W, _ = x.shape
        p = self.patch_size
        if H % p != 0 or W % p != 0:
            raise ValueError(f"image size ({H},{W}) not divisible by patch size {p}")
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(x)
        Hp, Wp = H // p, W // p
        return x.reshape(B, Hp * Wp, self.embed_dim), (Hp, Wp)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    # exact (erf) GELU is the torch nn.GELU default the reference uses; the
    # tanh approximation is ~1.7 ms/layer faster on v5e (erf is
    # VPU-transcendental-bound at the flagship 4096-wide hidden) and deviates
    # by < 1e-3 — below the bf16 compute noise. Opt-in via gelu_approx.
    gelu_approx: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
        return x


class SwiGLUFFNFused(nn.Module):
    """SwiGLU FFN with the DINOv2 'fused' hidden sizing (vit_giant2 only).

    hidden = (int(dim * 4 * 2/3) + 7) // 8 * 8   (dinov2/layers/swiglu_ffn.py:60-63)
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = (int(self.dim * 4 * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * hidden, dtype=self.dtype, param_dtype=jnp.float32, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        x = jax.nn.silu(x1) * x2
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="w3")(x)


class LayerScale(nn.Module):
    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.constant(self.init_values), (self.dim,), jnp.float32)
        return x * gamma.astype(x.dtype)


class _DenseParams(nn.Module):
    """Owns nn.Dense-shaped params (kernel/bias, same names, shapes and init)
    without computing — the fused-MLP kernel consumes them raw, so checkpoints
    and transplants are byte-compatible with the unfused tree."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class _MlpParams(nn.Module):
    """Mlp-shaped param tree (fc1/fc2) for the fused kernel path."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        k1, b1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        k2, b2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return k1, b1, k2, b2


class _LNParams(nn.Module):
    """nn.LayerNorm-shaped param pair (scale/bias) for the fused kernel path."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,),
                       jnp.float32)
        return s, b


class _ScaleParams(nn.Module):
    """LayerScale-shaped gamma for the fused kernel path."""

    dim: int
    init_values: float

    @nn.compact
    def __call__(self):
        return self.param("gamma", nn.initializers.constant(self.init_values),
                          (self.dim,), jnp.float32)


class _AttnParams(nn.Module):
    """Attention-shaped param tree (qkv/proj Dense pairs) for the fused
    LN+QKV kernel path (ops/fused_qkv.py)."""

    dim: int

    @nn.compact
    def __call__(self):
        kq, bq = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        kp, bp = _DenseParams(self.dim, self.dim, name="proj")()
        return kq, bq, kp, bp


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng: Optional[jax.Array]) -> jax.Array:
    """Per-sample stochastic depth (reference: backbones/adapter_blocks.py:41-49)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


# When True, Attention's einsum path additionally sows max|q·kᵀ·scale| into
# the "intermediates" collection — the measurement behind flash_fwd's _CLAMP
# safety bound (tools/probe_flash_scores.py). Off in normal operation.
PROBE_ATTN_SCORES = False


def _sdpa_einsum(q, k, v, scale, dtype):
    attn = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(dtype), k.astype(dtype))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v.astype(dtype))


def _flash_blocks(np_len: int) -> Tuple[int, int]:
    """(block_q, block_k) for the padded sequence. The library default
    (512-pad, small blocks) measured 27 ms at the flagship 1765-token shape;
    896-q-blocks with bk=896 measured 4.7 ms (vs 6.6 ms einsum); a SINGLE kv
    block (bk = full padded length) removes the online-softmax rescale pass
    entirely — 3.44 → 3.15 ms/layer on v5e (tools/bench_flash.py sweep).
    bq=1792 regresses (3.9) and bq=bk=1792 overflows the compiler."""
    bq = 128
    for cand in (1024, 896, 768, 640, 512, 384, 256, 128):
        if np_len % cand == 0:
            bq = cand
            break
    bk = np_len if np_len <= 2048 and np_len != bq else bq
    return bq, bk


def _flash_block_sizes(np_len: int):
    """Full BlockSizes (forward + backward) for the library flash kernel.

    The forward blocks are the tuned `_flash_blocks` pair; the BACKWARD blocks
    must also be set — `BlockSizes.has_backward_blocks` is False when any is
    None, and differentiating the kernel then fails with "not all backward
    blocks are specified" (hit by the SSL student path, the one place flash
    attention is trained THROUGH rather than run under stop_gradient). Backward
    tiles are capped at 512: the fwd single-kv-block trick (bk = full length)
    exists to skip the online-softmax rescale, which the backward has no
    analogue of, and the dq/dkv kernels keep ~3 whole-block operands live per
    tile step (the q, do, l/m rows plus the kv tile) so big tiles overflow
    scoped VMEM long before the forward's do."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq, bk = _flash_blocks(np_len)
    bb = 128
    for cand in (512, 384, 256, 128):
        if np_len % cand == 0:
            bb = cand
            break
    # the library broadcasts di (Σ o·do) to block_k_major_dq LANES before the
    # dq kernel (flash_attention.py:1316) — at 512 that materializes a full
    # (B, H, N, 512) f32 score-shaped tensor per layer (profiled ~0.8 ms + HBM
    # each on the SSL step). ASN_FLASH_DQK A/Bs a narrower dq k-major tile.
    bkdq = int(os.environ.get("ASN_FLASH_DQK", "0")) or bb
    # the override must (a) divide the padded length and (b) keep the minor
    # block a DIVISOR of the major one — the library's dq kernel iterates
    # block_k_major // block_k inner tiles, so e.g. major=896/minor=256 would
    # silently accumulate only 768 of 896 kv positions into dq (it validates
    # divisibility against kv_seq_len only, not major % minor)
    if np_len % bkdq != 0 or (bkdq > bb and bkdq % bb != 0):
        bkdq = bb
    return BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                      block_q_major_dkv=bb, block_k_major_dkv=bb,
                      block_k_dkv=bb, block_q_dkv=bb,
                      block_k_major_dq=bkdq, block_k_dq=min(bkdq, bb),
                      block_q_dq=bb)


def _flash_bhnd(q, k, v, scale, N, segment_ids=None):
    """Flash attention on (B, H, Np, Dh) tensors (already in kernel layout —
    the fused LN+QKV path); N = real token count for the padding mask."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    B, H, Np0, Dh = q.shape
    Np = -(-Np0 // 128) * 128
    if Np != Np0:
        pad = ((0, 0), (0, 0), (0, Np - Np0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if segment_ids is None:
        ids = (jnp.arange(Np) < N).astype(jnp.int32)[None, :]
        ids = jnp.broadcast_to(ids, (B, Np))
    else:
        ids = jnp.pad(segment_ids.astype(jnp.int32),
                      ((0, 0), (0, Np - segment_ids.shape[1])),
                      constant_values=-1)
    return flash_attention(
        q, k, v, segment_ids=SegmentIds(q=ids, kv=ids), sm_scale=scale,
        block_sizes=_flash_block_sizes(Np))


def _flash_fwd_bhnd(q, k, v, scale, N, segment_ids=None):
    """Forward-only bespoke flash (ops/flash_fwd.py) on (B, H, Np, Dh)
    tensors — the frozen-walk fast path (attn_impl="flash_fwd"). segment_ids,
    when given, must be BINARY validity (walk padding), not general packing."""
    B, H, Np0, Dh = q.shape
    Np = -(-Np0 // 128) * 128
    if Np != Np0:
        pad = ((0, 0), (0, 0), (0, Np - Np0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if segment_ids is None:
        valid = jnp.broadcast_to(
            (jnp.arange(Np) < N).astype(jnp.int32)[None], (B, Np))
    else:
        valid = jnp.pad(segment_ids.astype(jnp.int32),
                        ((0, 0), (0, Np - segment_ids.shape[1])),
                        constant_values=0)
    return flash_fwd(q, k, v, valid, scale)


def _sdpa_flash(q, k, v, scale, segment_ids=None):
    """Pallas TPU flash attention (jax.experimental.pallas.ops.tpu.flash_attention)
    — replaces the reference's xformers memory_efficient_attention
    (dinov2/layers/attention.py:72-89). Sequence padded to a 128 multiple; padded
    keys are masked out via segment ids so real-token rows are exact.

    `segment_ids` (B, N) int ≥0: tokens attend only within their own segment —
    the BlockDiagonalMask equivalent used for mixed-resolution crop packing
    (reference dinov2/layers/block.py:161-260). Padded positions get id −1,
    matching nothing real."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    B, N, H, Dh = q.shape
    Np = -(-N // 128) * 128
    pad = Np - N

    def to_bhnd(t):
        t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return t.transpose(0, 2, 1, 3)

    if segment_ids is None:
        ids = (jnp.arange(Np) < N).astype(jnp.int32)[None, :]
        ids = jnp.broadcast_to(ids, (B, Np))
    else:
        ids = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pad)),
                      constant_values=-1)
    out = flash_attention(
        to_bhnd(q), to_bhnd(k), to_bhnd(v),
        segment_ids=SegmentIds(q=ids, kv=ids),
        sm_scale=scale,
        block_sizes=_flash_block_sizes(Np),
    )
    return out.transpose(0, 2, 1, 3)[:, :N]


def _sdpa_einsum_segmented(q, k, v, scale, segment_ids, dtype):
    """Segment-masked SDPA: additive −inf outside the block-diagonal."""
    attn = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(dtype), k.astype(dtype))
    mask = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
    attn = jnp.where(mask, attn.astype(jnp.float32), -jnp.inf)
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v.astype(dtype))


def windowed_sdpa(q, k, v, scale, hw: Tuple[int, int], window: int, dtype):
    """Windowed attention (reference:
    dinov2/eval/segmentation_m2f/models/backbones/vit.py:224-316): pad the token
    grid to a window multiple, attend within non-overlapping windows, reverse.
    Operates on patch tokens only (no cls)."""
    B, N, H, Dh = q.shape
    h, w = hw
    pad_h = (-h) % window
    pad_w = (-w) % window

    def to_windows(t):
        t = t.reshape(B, h, w, H, Dh)
        t = jnp.pad(t, ((0, 0), (0, pad_h), (0, pad_w), (0, 0), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        t = t.reshape(B, hp // window, window, wp // window, window, H, Dh)
        return t.transpose(0, 1, 3, 2, 4, 5, 6).reshape(-1, window * window, H, Dh), (hp, wp)

    qw, (hp, wp) = to_windows(q)
    kw, _ = to_windows(k)
    vw, _ = to_windows(v)
    out = _sdpa_einsum(qw, kw, vw, scale, dtype)
    out = out.reshape(B, hp // window, wp // window, window, window, H, Dh)
    out = out.transpose(0, 1, 3, 2, 4, 5, 6).reshape(B, hp, wp, H, Dh)
    return out[:, :h, :w].reshape(B, N, H, Dh)


class Attention(nn.Module):
    """Multi-head self-attention (dinov2/layers/attention.py:36-69).

    attn_impl:
      * "einsum" — plain XLA SDPA (fp32 softmax), always available
      * "flash"  — Pallas TPU flash-attention kernel; at the flagship 1765-token
        sequence the einsum path is HBM-bound on the (B,H,N,N) score matrix
        (~3 GB/block @ bs8), which flash eliminates.

    windowed=True reproduces the m2f backbone's WindowedAttention
    (segmentation_m2f/models/backbones/vit.py:224-278): non-overlapping
    window_size² windows over the (padded) token grid, the zero-padded
    positions PARTICIPATING in the softmax with score 0 — the reference pads
    the qkv maps after the projection, so padding semantics match exactly.
    Requires `hw`; a leading cls token (N == h·w + 1) rides through the
    attention unchanged (windowed blocks never mix cls — the reference's
    windowed path carries no cls at all).
    """

    num_heads: int
    attn_impl: str = "einsum"
    windowed: bool = False
    window_size: int = 14
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_attn: bool = False,
                 hw: Optional[Tuple[int, int]] = None,
                 segment_ids: Optional[jax.Array] = None):
        B, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, Dh)
        scale = 1.0 / math.sqrt(Dh)
        if return_attn:
            attn = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(self.dtype), k.astype(self.dtype))
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v.astype(self.dtype))
            out = out.reshape(B, N, C)
            out = nn.Dense(C, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
            return out, attn
        if self.windowed:
            if hw is None:
                raise ValueError("windowed attention needs the token grid `hw`")
            n_cls = N - hw[0] * hw[1]
            if n_cls not in (0, 1):
                raise ValueError(f"token count {N} does not match grid {hw}")
            qp, kp, vp = (t[:, n_cls:] for t in (q, k, v))
            outp = windowed_sdpa(qp, kp, vp, scale, hw, self.window_size, self.dtype)
            out = jnp.concatenate([v[:, :n_cls], outp], axis=1) if n_cls else outp
        elif (segment_ids is not None
              and self.attn_impl not in ("flash", "flash_fwd")):
            out = _sdpa_einsum_segmented(q, k, v, scale, segment_ids, self.dtype)
        elif self.attn_impl == "flash_fwd":
            # forward-only bespoke kernel (ops/flash_fwd.py); caller guarantees
            # stop_gradient context + binary segment semantics
            out = _flash_fwd_bhnd(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3), scale, N,
                                  segment_ids=segment_ids
                                  ).transpose(0, 2, 1, 3)[:, :N]
        elif self.attn_impl == "flash":
            out = _sdpa_flash(q, k, v, scale, segment_ids=segment_ids)
        else:
            out = _sdpa_einsum(q, k, v, scale, self.dtype)
            if PROBE_ATTN_SCORES:
                s = jnp.einsum("bqhd,bkhd->bhqk",
                               (q * scale).astype(jnp.float32),
                               k.astype(jnp.float32))
                self.sow("intermediates", "max_abs_score", jnp.max(jnp.abs(s)))
        out = out.reshape(B, N, C)
        return nn.Dense(C, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class Block(nn.Module):
    """Pre-norm transformer block with LayerScale (dinov2/layers/block.py:43-114)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 1e-5
    ffn_layer: str = "mlp"
    drop_path_rate: float = 0.0
    attn_impl: str = "einsum"
    windowed: bool = False       # m2f windowed-ViT block (backbones/vit.py:324-384)
    window_size: int = 14
    gelu_approx: bool = False    # tanh GELU (see Mlp)
    ln_impl: str = "xla"         # "xla" | "pallas" (ops/layernorm.py fused kernel)
    mlp_impl: str = "xla"        # "xla" | "pallas" (ops/fused_mlp.py: one kernel
                                 # for LN2→fc1→gelu→fc2→LayerScale→residual;
                                 # requires ffn_layer="mlp" + gelu_approx +
                                 # LayerScale — falls back to the XLA path else)
    qkv_impl: str = "xla"        # "xla" | "pallas" (ops/fused_qkv.py: fused
                                 # LN1+qkv+head-split emitting flash-layout
                                 # q/k/v; requires attn_impl="flash", falls
                                 # back otherwise)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 return_attention: bool = False,
                 hw: Optional[Tuple[int, int]] = None,
                 segment_ids: Optional[jax.Array] = None):
        def ls(name: str, y: jax.Array) -> jax.Array:
            if self.init_values is None:
                return y
            return LayerScale(self.dim, self.init_values, name=name)(y)

        if (self.qkv_impl == "pallas"
                and self.attn_impl in ("flash", "flash_fwd")
                and not self.windowed and not return_attention):
            # fused LN1+qkv+head-split kernel emits q/k/v straight in the
            # flash (B, H, N, Dh) layout; the output projection contracts
            # (h, d) directly so no relayout ever materializes
            B, N, C = x.shape
            H = self.num_heads
            Dh = C // H
            s1, be1 = _LNParams(self.dim, name="norm1")()
            kq, bq, kp, bp = _AttnParams(self.dim, name="attn")()
            # flash_fwd consumes v with its softmax-denominator ones column
            # appended — bake it into the qkv kernel's store (no XLA pad)
            q, k, v = fused_ln_qkv(x, s1, be1, kq, bq, H, 1e-6,
                                   self.attn_impl == "flash_fwd")
            sdpa = (_flash_fwd_bhnd if self.attn_impl == "flash_fwd"
                    else _flash_bhnd)
            out = sdpa(q, k, v, 1.0 / math.sqrt(Dh), N,
                       segment_ids=segment_ids)[:, :, :N]
            h = jnp.einsum("bhnd,hdc->bnc", out.astype(self.dtype),
                           kp.reshape(H, Dh, C).astype(self.dtype))
            h = h + bp.astype(self.dtype)
            x = x + ls("ls1", h)
        else:
            h = layer_norm(self.ln_impl, self.dtype, "norm1")(x)
            if return_attention:
                # attention-map hook (root vision_transformer.py:80-92)
                _, attn = Attention(self.num_heads, dtype=self.dtype,
                                    name="attn")(h, return_attn=True)
                return attn
            h = Attention(self.num_heads, attn_impl=self.attn_impl,
                          windowed=self.windowed, window_size=self.window_size,
                          dtype=self.dtype, name="attn")(h, hw=hw,
                                                         segment_ids=segment_ids)
            x = x + ls("ls1", h)
        if (self.mlp_impl == "pallas" and self.ffn_layer == "mlp"
                and self.gelu_approx and self.init_values is not None):
            # one Pallas kernel for the whole MLP half; the param-holder
            # modules keep the tree identical to the unfused path
            s2, be2 = _LNParams(self.dim, name="norm2")()
            k1, b1, k2, b2 = _MlpParams(
                self.dim, int(self.dim * self.mlp_ratio), name="mlp")()
            gamma = _ScaleParams(self.dim, self.init_values, name="ls2")()
            return fused_ln_mlp(x, s2, be2, k1, b1, k2, b2, gamma)
        h = layer_norm(self.ln_impl, self.dtype, "norm2")(x)
        if self.ffn_layer == "swiglufused":
            h = SwiGLUFFNFused(self.dim, dtype=self.dtype, name="mlp")(h)
        elif self.ffn_layer == "mlp":
            h = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                    gelu_approx=self.gelu_approx, dtype=self.dtype, name="mlp")(h)
        else:
            raise ValueError(f"unknown ffn_layer {self.ffn_layer!r}")
        x = x + ls("ls2", h)
        return x
