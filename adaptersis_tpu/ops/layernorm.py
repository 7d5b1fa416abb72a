"""Fused LayerNorm Pallas (Mosaic) kernel — one VMEM pass for stats + normalize.

Why a kernel: the flagship train step applies ~120 LayerNorms to (B·N, 1024)
token blocks (2 per frozen ViT-L block application × 48 walks + taps +
decoders). XLA lowers each as a `convert_reduce` stats fusion plus a separate
normalize fusion, measured ~1.2 ms apiece at (16·1792, 1024) bf16 on v5e —
~8× off the ~0.15 ms HBM round-trip bound, because the fp32 upcast and the
lane-axis reduction don't fuse into a single pass. Here the row tile is read
once into VMEM, stats are computed in fp32 (fast-variance form E[x²]−E[x]²,
matching flax.linen.LayerNorm's default), and the normalized+affine output is
written straight back in the input dtype.

The frozen walks are forward-only (every block application sits under
stop_gradient — models/segmentor.py), so the kernel's job is purely the
forward; a custom VJP with a plain-XLA backward keeps it safe to use on
trainable paths (SSL) too.

Reference behavior reproduced: torch nn.LayerNorm(eps=1e-6) over the last
axis as used by every dinov2 block (/root/reference/dinov2/layers/block.py:58,
vision_transformer.py:88) — biased variance, affine scale+bias.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 1024       # row-tile height: 28672 flagship rows → 28 grid instances
_STATS = "sum"   # "sum" (VPU lane reduce) | "dot" (MXU ones-contraction)

# Tests force interpret mode explicitly; None → interpret off TPU backends.
_FORCE_INTERPRET: bool | None = None


def _interpret() -> bool:
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ln_kernel(eps, stats, *refs):
    xref, wref, bref, oref = refs
    x = xref[...].astype(jnp.float32)                      # (TR, C)
    C = x.shape[-1]
    if stats == "dot":
        ones = jnp.ones((1, C), jnp.float32)
        s1 = jax.lax.dot_general(x, ones, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(x * x, ones, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    else:
        s1 = jnp.sum(x, axis=1, keepdims=True)
        s2 = jnp.sum(x * x, axis=1, keepdims=True)
    mean = s1 * (1.0 / C)
    var = s2 * (1.0 / C) - mean * mean
    r = jax.lax.rsqrt(var + eps)
    w = wref[...].astype(jnp.float32)                      # (1, C)
    b = bref[...].astype(jnp.float32)
    oref[...] = ((x - mean) * (r * w) + b).astype(oref.dtype)


def _ln_fwd_impl(x, w, b, eps):
    orig_shape = x.shape
    C = orig_shape[-1]
    R = 1
    for d in orig_shape[:-1]:
        R *= d
    x2 = x.reshape(R, C)
    # cap the tile at ~1M elements so fp32 temps stay inside scoped VMEM at
    # wide feature dims (giant2 C=1536)
    tr_cap = max(128, ((1 << 20) // C) // 128 * 128)
    TR = min(_TR, tr_cap, _round_up(R, 128))
    Rp = _round_up(R, TR)
    if Rp != R:
        x2 = jnp.pad(x2, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, float(eps), _STATS),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C), x.dtype),
        # fp32 temps of a (1024, 1024) tile + double-buffered io can exceed
        # Mosaic's 16 MB default; the chip has more (see CLAUDE.md)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 2 ** 20),
        interpret=_interpret(),
    )(x2, w.reshape(1, C), b.reshape(1, C))
    return out[:R].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, w, b, eps=1e-6):
    """LayerNorm over the last axis. x (..., C) any float dtype; w/b (C,) fp32.
    Stats in fp32, output in x.dtype."""
    return _ln_fwd_impl(x, w, b, eps)


def _fused_ln_fwd(x, w, b, eps):
    return _ln_fwd_impl(x, w, b, eps), (x, w)


def _fused_ln_bwd(eps, res, dy):
    # Plain-XLA backward (stats recomputed): only trainable paths reach this —
    # the frozen walks never differentiate through their LNs.
    x, w = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * r
    dw = jnp.sum(dyf * xhat, axis=tuple(range(x.ndim - 1)))
    db = jnp.sum(dyf, axis=tuple(range(x.ndim - 1)))
    g = dyf * w.astype(jnp.float32)
    dx = r * (g - jnp.mean(g, axis=-1, keepdims=True)
              - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(w.dtype)


fused_layernorm.defvjp(_fused_ln_fwd, _fused_ln_bwd)
