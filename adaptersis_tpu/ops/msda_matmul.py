"""Dense-matmul multi-scale deformable attention with a hand-written VJP.

Motivation (measured on v5e, ViT-L@588 shapes): the lane-gather core runs a
CACNN call at ~80 ms fwd / ~250 ms fwd+bwd because the sampled volume
(4 corners × P points × Lq queries × D) dwarfs the tiny source grid (1764
tokens). Folding reference points + bilinear corner weights + attention weights
into ONE dense sampling matrix A (Lq × S_l) per (batch, head, level) turns the
op into MXU matmuls:

    out = Σ_l A_l @ V_l            A_l built by 16 fused compare-accumulate terms

The backward is written manually (jax.custom_vjp) because XLA's autodiff of the
A-construction crashes the TPU compiler on this stack and would rebuild giant
intermediates anyway:

    dV_l  = A_lᵀ @ dOut                                  (matmul)
    dcw_i = Σ_d dOut[q,d] · V_l[idx_i[q], d]             (one lane gather + dot)
    dloc, daw ← product rule through the corner weights  (elementwise)

All programs are forward-style (comparisons + matmuls + one lane gather), which
this stack compiles reliably. lax.map over batch bounds transients; heads are
vmapped inside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# lax.map chunk: >1 vectorizes batch elements per iteration. Measured on v5e:
# chunk 2 is perf-neutral but doubles the A transients and pushes the bs16
# flagship step 43 MB over HBM — keep 1.
_MAP_CHUNK = 1


def _corner_terms(loc, aw, H, W):
    """loc (Lq, P, 2), aw (Lq, P) → list of 4 (idx (Lq,P) int32, cw (Lq,P),
    plus the pieces needed for d/dloc)."""
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    corners = []
    for dx, dy, wfn, dwdx, dwdy in (
        (0, 0, (1 - tx) * (1 - ty), -(1 - ty), -(1 - tx)),
        (1, 0, tx * (1 - ty), (1 - ty), -tx),
        (0, 1, (1 - tx) * ty, -ty, (1 - tx)),
        (1, 1, tx * ty, ty, tx),
    ):
        xi = x0i + dx
        yi = y0i + dy
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(jnp.float32)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        corners.append((idx, wfn * valid * aw, valid, wfn, dwdx, dwdy))
    return corners


def _fwd_impl(value, sampling_locations, attention_weights, spatial_shapes):
    B, S, M, D = value.shape
    Lq, L, P = (sampling_locations.shape[1], sampling_locations.shape[3],
                sampling_locations.shape[4])

    def per_batch(args):
        vb, lb, wb = args  # (S, M, D), (Lq, M, L, P, 2), (Lq, M, L, P)

        def per_head(vm, lm, wm):  # (S, D), (Lq, L, P, 2), (Lq, L, P)
            out = jnp.zeros((Lq, D), jnp.float32)
            start = 0
            for lvl, (H, W) in enumerate(spatial_shapes):
                v_l = jax.lax.dynamic_slice_in_dim(vm, start, H * W, axis=0)
                A = jnp.zeros((Lq, H * W), jnp.float32)
                s_iota = jnp.arange(H * W, dtype=jnp.int32)
                for idx, cw, *_ in _corner_terms(
                        lm[:, lvl].astype(jnp.float32), wm[:, lvl].astype(jnp.float32), H, W):
                    for p in range(P):
                        A = A + cw[:, p, None] * (idx[:, p, None] == s_iota)
                out = out + jnp.dot(A.astype(v_l.dtype), v_l,
                                    preferred_element_type=jnp.float32)
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
    g = g.reshape(B, Lq, M, D)

    def per_batch(args):
        vb, lb, wb, gb = args  # (S,M,D), (Lq,M,L,P,2), (Lq,M,L,P), (Lq,M,D)

        def per_head(vm, lm, wm, gm):  # (S,D), (Lq,L,P,2), (Lq,L,P), (Lq,D)
            # levels write DISJOINT value rows and disjoint (·, lvl) slices —
            # build per-level pieces and concat/stack (no .at scatters, which
            # lower poorly under vmap on TPU)
            dv_parts, dl_parts, da_parts = [], [], []
            start = 0
            for lvl, (H, W) in enumerate(spatial_shapes):
                v_l = jax.lax.dynamic_slice_in_dim(vm, start, H * W, axis=0)
                loc = lm[:, lvl].astype(jnp.float32)
                aw = wm[:, lvl].astype(jnp.float32)
                corners = _corner_terms(loc, aw, H, W)
                s_iota = jnp.arange(H * W, dtype=jnp.int32)
                # rebuild A for dV
                A = jnp.zeros((Lq, H * W), jnp.float32)
                for idx, cw, *_ in corners:
                    for p in range(P):
                        A = A + cw[:, p, None] * (idx[:, p, None] == s_iota)
                dv_parts.append(jnp.dot(A.T.astype(gm.dtype), gm,
                                        preferred_element_type=jnp.float32))
                # dA[q, s] = Σ_d g[q,d]·V[s,d] — ONE matmul, then per-corner values
                # are tiny (Lq, P) minor-axis gathers of dA_full
                dA_full = jnp.dot(gm, v_l.T.astype(gm.dtype),
                                  preferred_element_type=jnp.float32)  # (Lq, HW)
                dlx = jnp.zeros((Lq, P), jnp.float32)
                dly = jnp.zeros((Lq, P), jnp.float32)
                da = jnp.zeros((Lq, P), jnp.float32)
                for idx, cw, valid, wfn, dwdx, dwdy in corners:
                    dA_i = jnp.take_along_axis(dA_full, idx, axis=1)   # (Lq, P)
                    da = da + dA_i * wfn * valid
                    scale = dA_i * valid * aw
                    dlx = dlx + scale * dwdx * W
                    dly = dly + scale * dwdy * H
                dl_parts.append(jnp.stack([dlx, dly], axis=-1))        # (Lq, P, 2)
                da_parts.append(da)
                start += H * W
            dv = jnp.concatenate(dv_parts, axis=0)                     # (S, D)
            dloc = jnp.stack(dl_parts, axis=1)                         # (Lq, L, P, 2)
            daw = jnp.stack(da_parts, axis=1)                          # (Lq, L, P)
            return dv, dloc, daw

        return jax.vmap(per_head, in_axes=(1, 1, 1, 1), out_axes=(1, 1, 1))(vb, lb, wb, gb)

    dv, dloc, daw = jax.lax.map(per_batch,
                                (value, sampling_locations, attention_weights, g),
                                batch_size=_MAP_CHUNK if _MAP_CHUNK > 1 else None)
    return (dv.astype(value.dtype), dloc.astype(sampling_locations.dtype),
            daw.astype(attention_weights.dtype))


msda_matmul.defvjp(_msda_fwd, _msda_bwd)
