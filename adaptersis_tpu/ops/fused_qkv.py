"""Fused [LayerNorm → qkv projection → head split/transpose] Pallas (Mosaic)
kernel: emits q, k, v directly in the flash-attention (B, H, N, Dh) layout.

Why a kernel: XLA lowers the block's attention front half as a qkv matmul
fusion followed by three slice+transpose relayouts of (B, N, H, Dh) →
(B, H, N, Dh) — measured ~0.9 ms/layer of pure relayout at the flagship
(16×1792, 1024) bf16 shape (the `slice_bitcast_fusion` family, ~42 ms/step
over 48 block applications). Here the projection output never leaves VMEM in
token-major form: each row tile is normalized (tile-local LN stats), hit with
one lane-contraction MXU dot against the VMEM-resident transposed weight, and
written per-head into the three (B, H, N, Dh) outputs.

Forward-only by the same argument as ops/fused_mlp.py (the frozen walks sit
under stop_gradient); the custom VJP recomputes through the plain formula.

Reference behavior reproduced: dinov2/layers/attention.py:36-55 (qkv Linear
with bias, head split) + block.py:58 (pre-norm, torch LayerNorm eps 1e-6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile height. Sweep result (round 4, tools/bench_qkv.py on v5e at the
# flagship 16×1792: TR=896 measures ~5% faster STANDALONE (2.73 vs 2.87 ms
# mean-of-3, tunnel noise ±0.2) but the FULL-STEP bench is neutral-to-worse
# (20.223 vs 20.231 img/s) — the per-call win is hidden by overlap, so the
# smaller tile keeps VMEM pressure and compile surface down. A 448 variant
# hung Mosaic's remote compile >15 min on this image; don't retry.
_TR = 256

# Tests force interpret mode explicitly; None → interpret off TPU backends.
_FORCE_INTERPRET: bool | None = None


def _interpret() -> bool:
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(eps, H, v_ones, *refs):
    xref, lsref, lbref, wref, bref, qref, kref, vref = refs
    x = xref[0]                                            # (TR, C)
    xf = x.astype(jnp.float32)
    C = xf.shape[-1]
    mean = jnp.sum(xf, axis=1, keepdims=True) * (1.0 / C)
    var = jnp.sum(xf * xf, axis=1, keepdims=True) * (1.0 / C) - mean * mean
    r = jax.lax.rsqrt(var + eps)
    ls = lsref[...].astype(jnp.float32)
    lb = lbref[...].astype(jnp.float32)
    xn = ((xf - mean) * (r * ls) + lb).astype(x.dtype)
    # y = xn @ Wqkv + b — W ships transposed (3C, C): lane-contraction form
    y = jax.lax.dot_general(xn, wref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = (y + bref[...].astype(jnp.float32)).astype(x.dtype)  # (TR, 3C)
    Dh = C // H
    # head split as H static lane slices per output (Mosaic can't shape-cast
    # a lane split like (TR, 3C) -> (TR, H, Dh)); each write is (TR, Dh)
    ones = jnp.ones((y.shape[0], 1), y.dtype) if v_ones else None
    for i, oref in enumerate((qref, kref, vref)):
        for h in range(H):
            s = i * C + h * Dh
            if v_ones and oref is vref:
                # flash_fwd's softmax-denominator column (ops/flash_fwd.py)
                # baked in here: saves a (B, H, N, 64→65) XLA pad per block
                # application (~0.35 ms ×48 = ~17 ms/step at the flagship)
                oref[0, h] = jnp.concatenate([y[:, s:s + Dh], ones], axis=1)
            else:
                oref[0, h] = y[:, s:s + Dh]


def reference_ln_qkv(x, ln_scale, ln_bias, w, b, num_heads, eps=1e-6):
    """Plain-XLA formula: LN → Dense(3C) → (B, H, N, Dh) q/k/v."""
    B, N, C = x.shape
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    y = xn.astype(dt) @ w.astype(dt) + b.astype(jnp.float32)
    y = y.astype(dt).reshape(B, N, 3, num_heads, C // num_heads)
    y = y.transpose(2, 0, 3, 1, 4)                         # (3, B, H, N, Dh)
    return y[0], y[1], y[2]


def _fwd_impl(x, ln_scale, ln_bias, w, b, num_heads, eps, v_ones=False):
    B, N, C = x.shape
    H = num_heads
    Dh = C // H
    dt = x.dtype
    TR = min(_TR, _round_up(N, 128))
    Np = _round_up(N, TR)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
    wt = w.astype(dt).T                                    # (3C, C)
    row = lambda a, n: a.reshape(1, n).astype(jnp.float32)  # noqa: E731
    const = lambda shape: pl.BlockSpec(                     # noqa: E731
        shape, lambda bi, ti: (0, 0), memory_space=pltpu.VMEM)
    Dv = Dh + 1 if v_ones else Dh
    ospec = lambda d: pl.BlockSpec(                         # noqa: E731
        (1, H, TR, d), lambda bi, ti: (bi, 0, ti, 0), memory_space=pltpu.VMEM)
    oshape = lambda d: jax.ShapeDtypeStruct((B, H, Np, d), dt)  # noqa: E731
    q, k, v = pl.pallas_call(
        functools.partial(_kernel, float(eps), H, v_ones),
        grid=(B, Np // TR),
        in_specs=[
            pl.BlockSpec((1, TR, C), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            const((1, C)), const((1, C)),
            const((3 * C, C)), const((1, 3 * C)),
        ],
        out_specs=[ospec(Dh), ospec(Dh), ospec(Dv)],
        out_shape=[oshape(Dh), oshape(Dh), oshape(Dv)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2 ** 20),
        interpret=_interpret(),
    )(x, row(ln_scale, C), row(ln_bias, C), wt, row(b, 3 * C))
    return q[:, :, :N], k[:, :, :N], v[:, :, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_ln_qkv(x, ln_scale, ln_bias, w, b, num_heads, eps=1e-6,
                 v_ones=False):
    """(q, k, v) each (B, H, N, C//H) from x (B, N, C).

    ln_scale/ln_bias (C,) fp32; w (C, 3C), b (3C,) fp32 (cast to x.dtype).
    v_ones=True appends flash_fwd's softmax-denominator ones column to v
    (→ (B, H, N, C//H + 1)); only valid with attn_impl="flash_fwd"."""
    return _fwd_impl(x, ln_scale, ln_bias, w, b, num_heads, eps, v_ones)


def _fused_fwd(x, ln_scale, ln_bias, w, b, num_heads, eps, v_ones):
    out = _fwd_impl(x, ln_scale, ln_bias, w, b, num_heads, eps, v_ones)
    return out, (x, ln_scale, ln_bias, w, b)


def _fused_bwd(num_heads, eps, v_ones, res, dy):
    if v_ones:
        dq, dk, dv = dy
        dy = (dq, dk, dv[..., :-1])
    _, vjp = jax.vjp(
        functools.partial(reference_ln_qkv, num_heads=num_heads, eps=eps),
        *res)
    return vjp(dy)


fused_ln_qkv.defvjp(_fused_fwd, _fused_bwd)
