"""Fused [LayerNorm → fc1 → tanh-GELU → fc2 → LayerScale → +residual] Pallas
(Mosaic) kernel for the transformer block's MLP half.

Why a kernel: at the flagship shapes (28672 tokens × C=1024, hidden 4096,
bf16) XLA lowers the MLP half as two kOutput matmul fusions that round-trip
the (tokens, 4096) hidden matrix through HBM — ~470 MB of traffic per block
application that a fused kernel never materializes (measured 4.7 ms/layer
with tanh GELU vs a ~2.4 ms MXU bound). LayerNorm is row-wise, so its stats
are tile-local and fold into the same pass; both weight matrices ship
TRANSPOSED (lane-contraction A@Bᵀ form, see CLAUDE.md) and stay VMEM-resident
across the whole grid (constant index maps → single-buffered, ~16 MB bf16).

The frozen ViT walks are forward-only (stop_gradient), so the kernel is
forward-only; a custom VJP with a plain-XLA backward (recompute from the
reference formula) keeps it safe on trainable paths.

Reference behavior reproduced: dinov2/layers/block.py:84-91 (pre-norm MLP
residual with LayerScale), layers/mlp.py:16-40, layer_scale.py:15-27 —
torch LayerNorm eps 1e-6, GELU, Linear biases. The tanh-GELU substitution is
the same opt-in `gelu_approx` used by the XLA path (deviation < 1e-3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 256        # row-tile height; 28672 flagship rows → 112 grid instances

# Tests force interpret mode explicitly; None → interpret off TPU backends.
_FORCE_INTERPRET: bool | None = None


def _interpret() -> bool:
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(eps, *refs):
    (xref, lsref, lbref, w1ref, b1ref, w2ref, b2ref, gref, oref) = refs
    x = xref[...]                                          # (TR, C) in-dtype
    xf = x.astype(jnp.float32)
    C = xf.shape[-1]
    mean = jnp.sum(xf, axis=1, keepdims=True) * (1.0 / C)
    var = jnp.sum(xf * xf, axis=1, keepdims=True) * (1.0 / C) - mean * mean
    r = jax.lax.rsqrt(var + eps)
    ls = lsref[...].astype(jnp.float32)                    # (1, C)
    lb = lbref[...].astype(jnp.float32)
    xn = ((xf - mean) * (r * ls) + lb).astype(x.dtype)     # (TR, C)
    # h = xn @ W1 + b1 — W1 ships transposed (H, C): lane-contraction form
    h = jax.lax.dot_general(xn, w1ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1ref[...].astype(jnp.float32)                 # (TR, H) fp32
    # tanh GELU in fp32 (the XLA path's gelu also upcasts transcendentals)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = jax.lax.dot_general(h, w2ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2ref[...].astype(jnp.float32)                 # (TR, C) fp32
    g = gref[...].astype(jnp.float32)
    oref[...] = (xf + g * y).astype(oref.dtype)


def reference_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                     eps=1e-6, approximate=True):
    """Plain-XLA formula the kernel reproduces (and the VJP differentiates):
    out = x + gamma ⊙ fc2(gelu(fc1(LN(x)))) with flax fast-variance LN."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    h = xn.astype(dt) @ w1.astype(dt) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=approximate).astype(dt)
    y = h @ w2.astype(dt) + b2.astype(jnp.float32)
    return (xf + gamma.astype(jnp.float32) * y).astype(dt)


def _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps):
    orig_shape = x.shape
    C = orig_shape[-1]
    H = w1.shape[1]
    R = 1
    for d in orig_shape[:-1]:
        R *= d
    x2 = x.reshape(R, C)
    TR = min(_TR, _round_up(R, 128))
    Rp = _round_up(R, TR)
    if Rp != R:
        x2 = jnp.pad(x2, ((0, Rp - R), (0, 0)))
    dt = x.dtype
    w1t = w1.astype(dt).T                                  # (H, C)
    w2t = w2.astype(dt).T                                  # (C, H)
    row = lambda a, n: a.reshape(1, n).astype(jnp.float32)  # noqa: E731
    const = lambda shape: pl.BlockSpec(                     # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, float(eps)),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const((1, C)), const((1, C)),
            const((H, C)), const((1, H)),
            const((C, H)), const((1, C)),
            const((1, C)),
        ],
        out_specs=pl.BlockSpec((TR, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C), dt),
        # both weight matrices live in VMEM for the whole grid (~16 MB bf16)
        # plus the fp32 hidden tile — well past Mosaic's 16 MB default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2 ** 20),
        interpret=_interpret(),
    )(x2, row(ln_scale, C), row(ln_bias, C), w1t, row(b1, H), w2t,
      row(b2, C), row(gamma, C))
    return out[:R].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps=1e-6):
    """out = x + gamma ⊙ fc2(tanh-gelu(fc1(LN(x)))).

    x (..., C); ln_scale/ln_bias/gamma (C,) fp32; w1 (C, H), b1 (H,),
    w2 (H, C), b2 (C,) fp32 (cast to x.dtype for the MXU dots)."""
    return _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps)


def _fused_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps):
    out = _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _fused_bwd(eps, res, dy):
    # Plain-XLA backward (recomputes the forward): only trainable paths reach
    # this — the frozen walks never differentiate through their blocks.
    _, vjp = jax.vjp(
        functools.partial(reference_ln_mlp, eps=eps, approximate=True), *res)
    return vjp(dy)


fused_ln_mlp.defvjp(_fused_fwd, _fused_bwd)
