"""Forward-only single-kv-block flash attention Pallas (Mosaic) kernel.

Replaces jax.experimental.pallas flash_attention for the segmentor's FROZEN
walks (every backbone block application sits under stop_gradient, matching the
reference's `torch.no_grad()` — models/segmentor.py:22), where the library
kernel's generality is pure overhead:

* online-softmax row-max: with bounded scores a constant CLAMP replaces the
  per-row lane-reduce max (exp(S)/Σexp(S) == softmax(S) exactly whenever
  max(S) < CLAMP; see `_CLAMP` note below),
* rowsum(p): rides the o = p @ V MXU dot for free — V ships with a ones
  column appended (Dh=64 → the dot already pads its N dimension to 128
  lanes, so the extra column costs zero MXU time),
* segment-id compare+select masking: one precomputed additive bias row
  (0 valid / −1e9 pad) — ONE S-sized add instead of an i32 compare + select,
* m/l bookkeeping, causal/ab/dropout branches: gone.

S-sized (bq, Np) passes per tile: bias-add, clamp, exp, bf16 cast — ~4 vs the
library's ~8-10. Measured (tools/bench_flash.py, v5e, 16×16×1792×64 bf16):
library tuned single-kv-block 3.15 ms/call; this kernel ~2.3 ms/call.

_CLAMP safety: scores are q·k/√Dh of LayerNorm outputs — MEASURED on-chip
(tools/probe_flash_scores.py, VERIFY_FLASH_CLAMP.md): max|S| over all 48
flagship walk applications = 6.37, identical at random init and after 50
train steps (the frozen clean walk dominates), a 9.4× margin below the
clamp; re-probed per round. Whenever the true row max < 60 the result is EXACTLY
softmax (constant shifts cancel); if any score exceeded 60 the clamp would
flatten weighting among >e⁶⁰-dominant entries only (already saturated
attention), and e⁶⁰·1792 ≈ 2e29 stays far below f32 overflow, so no NaN is
possible. The reference's xformers memory_efficient_attention
(dinov2/layers/attention.py:72-89) subtracts the row max instead; both
compute softmax(q kᵀ·scale) v.

Forward-optimized: the custom VJP recomputes through the plain XLA formula
(the fused_qkv/fused_mlp pattern) — it exists so jax can linearize the graph,
and is DCE'd in the stop_gradient walks this kernel is built for. Callers
needing a FAST backward must use the library kernel via attn_impl="flash".
Key validity is BINARY (`valid > 0`); multi-segment packing (SSL crop
packing) is not representable as a bias row — use attn_impl="flash" there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# exact-softmax bound; see module docstring
_CLAMP = 60.0

# Tests force interpret mode explicitly; None → interpret off TPU backends.
_FORCE_INTERPRET: bool | None = None


def _interpret() -> bool:
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


def _pick_bq(np_len: int) -> int:
    """Largest query tile dividing the padded length (S scratch = bq·Np f32;
    896 keeps the flagship's (896, 1792) S + bf16 p under ~10 MB VMEM)."""
    for cand in (896, 512, 448, 256, 128):
        if np_len % cand == 0:
            return cand
    return 128


def _kernel(scale, Dh, *refs):
    qref, kref, vref, bref, oref = refs
    q = qref[0, 0] * jnp.asarray(scale, qref.dtype)        # (BQ, Dh) tiny
    # S = q·kᵀ — contraction on the LANES of both operands (native Mosaic form)
    s = jax.lax.dot_general(q, kref[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, Np)
    s = jnp.minimum(s + bref[0, :1, :], _CLAMP)
    p = jnp.exp(s).astype(qref.dtype)                      # (BQ, Np)
    # [o | l] in ONE dot: vref carries the ones column at lane Dh
    ol = jax.lax.dot_general(p, vref[0, 0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BQ, Dh+1)
    o = ol[:, :Dh]
    l = ol[:, Dh:Dh + 1]
    oref[0, 0] = (o * (1.0 / l)).astype(oref.dtype)


def _reference_sdpa(q, k, v, valid, scale):
    """Plain-XLA masked softmax attention — the VJP recompute path."""
    if v.shape[-1] == q.shape[-1] + 1:      # pre-baked ones column (fused_qkv)
        v = v[..., :-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", (q * scale).astype(q.dtype), k)
    s = jnp.where(valid[:, None, None, :] > 0, s.astype(jnp.float32),
                  -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_fwd(q, k, v, valid, scale):
    """softmax(q kᵀ·scale + mask) v — forward runs the bespoke kernel.

    q, k, v: (B, H, Np, Dh) with Np a multiple of 128 (pre-padded walks).
    valid:   (B, Np) — key is real iff valid > 0 (binary mask, NOT general
             segment ids). Padded-query rows produce garbage rows the caller
             slices off.
    """
    return _fwd_impl(q, k, v, valid, scale)


def _flash_fwd_fwd(q, k, v, valid, scale):
    return _fwd_impl(q, k, v, valid, scale), (q, k, v, valid)


def _flash_fwd_bwd(scale, res, dy):
    q, k, v, valid = res
    _, vjp = jax.vjp(
        functools.partial(_reference_sdpa, scale=scale), q, k, v, valid)
    dq, dk, dv, _ = vjp(dy)
    return dq, dk, dv, None


def _fwd_impl(q, k, v, valid, scale):
    B, H, Np, Dh = q.shape
    if Np % 128:
        raise ValueError(f"flash_fwd needs 128-multiple length, got {Np}")
    BQ = _pick_bq(Np)
    dt = q.dtype
    # ones column at lane Dh: the o-dot pads Dh 64→128 on the MXU anyway,
    # so the softmax denominator comes out of the same dot for free. When v
    # arrives pre-widened (fused_ln_qkv(v_ones=True) bakes the column into
    # its store), the XLA pad below — ~0.35 ms × 48 block applications at
    # the flagship — disappears entirely.
    if v.shape[-1] == Dh + 1:
        vp = v
    else:
        vp = jnp.concatenate([v, jnp.ones((B, H, Np, 1), v.dtype)], axis=-1)
    # bias replicated on 8 sublanes: Mosaic requires the block's sublane dim
    # divisible by 8, and indexing by the grid's own b avoids computed
    # index_maps (a `// H` there lowers to a select Mosaic rejects)
    bias = jnp.where(valid > 0, 0.0, -1e9).astype(jnp.float32)  # (B, Np)
    bias = jnp.broadcast_to(bias[:, None], (B, 8, Np))

    out = pl.pallas_call(
        functools.partial(_kernel, float(scale), Dh),
        grid=(B, H, Np // BQ),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, Dh), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, Dh), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, Dh + 1), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Np), lambda b, h, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, Dh), lambda b, h, t: (b, h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Np, Dh), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 2 ** 20),
        interpret=_interpret(),
    )(q, k, vp, bias)
    return out


flash_fwd.defvjp(_flash_fwd_fwd, _flash_fwd_bwd)
