"""Dense-matmul multi-scale deformable attention with a hand-written VJP.

Motivation (measured on v5e, ViT-L@588 shapes): the lane-gather core runs a
CACNN call at ~80 ms fwd / ~250 ms fwd+bwd because the sampled volume
(4 corners × P points × Lq queries × D) dwarfs the tiny source grid (1764
tokens). Folding reference points + bilinear corner weights + attention weights
into ONE dense sampling matrix A (Lq × S_l) per (batch, head, level) turns the
op into MXU matmuls:

    out = Σ_l A_l @ V_l

Key layout fact exploited here: the bilinear one-hot matrix is SEPARABLE. For
point p the (Lq, H·W) sampling matrix factors into per-axis vectors

    A_p[q, (h, w)] = aw_p[q] · Uy_p[q, h] · Ux_p[q, w]

where Ux (Lq, P, W) / Uy (Lq, P, H) carry the two bilinear corner weights and
the zero-padding validity of each axis (grid_sample semantics factorize:
valid(x, y) = valid_x(x) · valid_y(y)). So

    A = Σ_p (aw_p · Uy_p) ⊗ Ux_p         — P outer products, built with
                                           2·(H+W) compares per (query, point)
                                           instead of 16 full (Lq, HW) terms.

A is stored in value.dtype (bf16 on the TPU path → half the HBM traffic of the
round-1 fp32 build; fp32 inputs keep fp32 exactness for the parity tests).

The backward is hand-written (jax.custom_vjp) because XLA's autodiff of the
A-construction crashes this stack's TPU compiler and would rebuild giant
intermediates anyway. All contractions go through the separable factors:

    dV_l  = A_lᵀ @ g                       (dot_general, no transposed copy)
    dA_l  = g @ V_lᵀ                       (one matmul, bf16)
    tw    = Σ_w dA·Ux ; twd = Σ_w dA·dUx   (batched matmuls over tiny axes)
    daw   = Σ_h tw·Uy
    dx    = aw·W·Σ_h twd·Uy ;  dy = aw·H·Σ_h tw·dUy

All programs are forward-style (comparisons + matmuls), which this stack
compiles reliably. lax.map over batch bounds transients; heads are vmapped
inside.

Reference math: /root/reference/backbones/ops/modules/ms_deform_attn.py:33-54
(grid_sample bilinear, zero padding, align_corners=False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# lax.map chunk: >1 vectorizes batch elements per iteration. Measured on v5e:
# chunk 2 is perf-neutral but doubles the A transients and pushes the bs16
# flagship step over HBM — keep 1.
_MAP_CHUNK = 1


def _axis_onehots(t, i0, W):
    """Bilinear one-hot rows along one axis.

    t  (Lq, P) fractional part, i0 (Lq, P) int32 floor index →
      U  (Lq, P, W) — corner weights (1-t) at i0 and t at i0+1, zeroed when the
                      corner falls outside [0, W) (grid_sample zero padding)
      dU (Lq, P, W) — d U / d pixel-coordinate: -1 at i0, +1 at i0+1 (masked)
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    i1 = i0 + 1
    m0 = (jnp.clip(i0, 0, W - 1)[..., None] == iota) & ((i0 >= 0) & (i0 < W))[..., None]
    m1 = (jnp.clip(i1, 0, W - 1)[..., None] == iota) & ((i1 >= 0) & (i1 < W))[..., None]
    w0 = (1.0 - t)[..., None]
    w1 = t[..., None]
    zero = jnp.zeros((), jnp.float32)
    U = jnp.where(m0, w0, zero) + jnp.where(m1, w1, zero)
    dU = jnp.where(m1, 1.0, zero) - jnp.where(m0, 1.0, zero)
    return U, dU


def _separable_factors(loc, H, W):
    """loc (Lq, P, 2) in [0,1] → (Uy, dUy) over H and (Ux, dUx) over W."""
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    Ux, dUx = _axis_onehots(x - x0, x0.astype(jnp.int32), W)
    Uy, dUy = _axis_onehots(y - y0, y0.astype(jnp.int32), H)
    return (Uy, dUy), (Ux, dUx)


def _build_A(loc, aw, H, W, a_dtype):
    """Dense sampling matrix A (Lq, H*W) = Σ_p (aw_p·Uy_p) ⊗ Ux_p."""
    (Uy, _), (Ux, _) = _separable_factors(loc, H, W)
    Lq = loc.shape[0]
    A = jnp.einsum("qph,qpw->qhw", aw[..., None] * Uy, Ux)
    return A.reshape(Lq, H * W).astype(a_dtype)


def _fwd_impl(value, sampling_locations, attention_weights, spatial_shapes):
    B, S, M, D = value.shape
    Lq = sampling_locations.shape[1]
    a_dtype = value.dtype

    def per_batch(args):
        vb, lb, wb = args  # (S, M, D), (Lq, M, L, P, 2), (Lq, M, L, P)

        def per_head(vm, lm, wm):  # (S, D), (Lq, L, P, 2), (Lq, L, P)
            out = jnp.zeros((Lq, D), jnp.float32)
            start = 0
            for lvl, (H, W) in enumerate(spatial_shapes):
                v_l = jax.lax.dynamic_slice_in_dim(vm, start, H * W, axis=0)
                A = _build_A(lm[:, lvl].astype(jnp.float32),
                             wm[:, lvl].astype(jnp.float32), H, W, a_dtype)
                out = out + jnp.dot(A, v_l, preferred_element_type=jnp.float32)
                start += H * W
            return out

        return jax.vmap(per_head, in_axes=(1, 1, 1), out_axes=1)(vb, lb, wb)

    out = jax.lax.map(per_batch, (value, sampling_locations, attention_weights),
                      batch_size=_MAP_CHUNK if _MAP_CHUNK > 1 else None)
    return out.reshape(B, Lq, M * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def msda_matmul(value, sampling_locations, attention_weights, spatial_shapes):
    """value (B,S,M,D); loc (B,Lq,M,L,P,2) in [0,1]; aw (B,Lq,M,L,P).
    Returns (B, Lq, M*D) fp32."""
    return _fwd_impl(value, sampling_locations, attention_weights, spatial_shapes)


def _msda_fwd(value, sampling_locations, attention_weights, spatial_shapes):
    out = _fwd_impl(value, sampling_locations, attention_weights, spatial_shapes)
    return out, (value, sampling_locations, attention_weights)


def _msda_bwd(spatial_shapes, res, g):
    value, sampling_locations, attention_weights = res
    B, S, M, D = value.shape
    Lq, L, P = (sampling_locations.shape[1], sampling_locations.shape[3],
                sampling_locations.shape[4])
    a_dtype = value.dtype
    g = g.reshape(B, Lq, M, D)

    def per_batch(args):
        vb, lb, wb, gb = args  # (S,M,D), (Lq,M,L,P,2), (Lq,M,L,P), (Lq,M,D)

        def per_head(vm, lm, wm, gm):  # (S,D), (Lq,L,P,2), (Lq,L,P), (Lq,D)
            # levels write DISJOINT value rows and disjoint (·, lvl) slices —
            # build per-level pieces and concat/stack (no .at scatters, which
            # lower poorly under vmap on TPU)
            gm_a = gm.astype(a_dtype)
            dv_parts, dl_parts, da_parts = [], [], []
            start = 0
            for lvl, (H, W) in enumerate(spatial_shapes):
                v_l = jax.lax.dynamic_slice_in_dim(vm, start, H * W, axis=0)
                loc = lm[:, lvl].astype(jnp.float32)
                aw = wm[:, lvl].astype(jnp.float32)
                (Uy, dUy), (Ux, dUx) = _separable_factors(loc, H, W)

                # dV = Aᵀ @ g — rebuild A (cheap separable build), contract
                # over q via dot_general: no transposed copy materializes
                A = _build_A(loc, aw, H, W, a_dtype)
                dv_parts.append(jax.lax.dot_general(
                    A, gm_a, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))       # (HW, D)

                # dA[q, s] = Σ_d g[q,d]·V[s,d] — ONE matmul (contract D, no
                # transposed copies), then everything else rides the separable
                # factors: contractions over the tiny W/H axes only.
                dA = jax.lax.dot_general(
                    gm_a, v_l.astype(a_dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (Lq, HW)
                dA3 = dA.reshape(Lq, H, W)
                tw = jnp.einsum("qhw,qpw->qph", dA3, Ux)       # Σ_w dA·Ux
                twd = jnp.einsum("qhw,qpw->qph", dA3, dUx)     # Σ_w dA·dUx
                da = jnp.einsum("qph,qph->qp", tw, Uy)
                dlx = aw * W * jnp.einsum("qph,qph->qp", twd, Uy)
                dly = aw * H * jnp.einsum("qph,qph->qp", tw, dUy)
                dl_parts.append(jnp.stack([dlx, dly], axis=-1))  # (Lq, P, 2)
                da_parts.append(da)
                start += H * W
            dv = jnp.concatenate(dv_parts, axis=0)               # (S, D)
            dloc = jnp.stack(dl_parts, axis=1)                   # (Lq, L, P, 2)
            daw = jnp.stack(da_parts, axis=1)                    # (Lq, L, P)
            return dv, dloc, daw

        return jax.vmap(per_head, in_axes=(1, 1, 1, 1), out_axes=(1, 1, 1))(vb, lb, wb, gb)

    dv, dloc, daw = jax.lax.map(per_batch,
                                (value, sampling_locations, attention_weights, g),
                                batch_size=_MAP_CHUNK if _MAP_CHUNK > 1 else None)
    return (dv.astype(value.dtype), dloc.astype(sampling_locations.dtype),
            daw.astype(attention_weights.dtype))


msda_matmul.defvjp(_msda_fwd, _msda_bwd)
