"""Pallas (Mosaic) multi-scale deformable attention — flat-dense VMEM tiles with
spatial-locality group skipping.

Why a kernel: the dense-matmul formulation (ops/msda_matmul.py) is FLOP-optimal
(out = Σ_l A_l @ V_l with A folding bilinear corners + attention weights), but
under plain XLA the mostly-zero A matrices (≈2.3 GB/call at flagship shapes)
round-trip through HBM: measured 51-66 ms/call fwd on v5e where the useful MXU
work is ~2 ms.

This kernel never materializes A in HBM, and exploits three structural facts:

1. **Flat-dense grouping.** A-tile column t of group g addresses flat source
   pixel s = g·1024 + t across ALL levels at once — V needs no relayout (just a
   tail pad to a 1024 multiple), there is zero intra-level lane padding, and
   one (TQ, 1024) @ (1024, D) MXU dot covers every level that intersects the
   group. Per-lane (level, h, w) coordinates come from tiny PRECOMPUTED
   constant maps (hrow/wcol, sentinel −2³⁰ outside the level), so the bilinear
   one-hot build is pure broadcast compares:

       A[q, t] += aw_p · [hrow==y0 →1−fy | hrow==y0+1 →fy]
                       · [wcol==x0 →1−fx | wcol==x0+1 →fx]

   grid_sample ZERO padding (align_corners=False, reference
   /root/reference/backbones/ops/modules/ms_deform_attn.py:33-54) is automatic:
   out-of-range corner indices simply match no map entry.

2. **Spatial locality skipping.** Queries are raster-ordered tokens and their
   sampling points cluster around their own location, so a 256-query tile
   touches only ~1-3 of the flat groups. Each (tile, group, level) build and
   each (tile, group) dot runs under a cheap interval test
   [s_lo, s_hi] ∩ [g·1024, g·1024+1023] ≠ ∅ computed from per-tile min/max
   corner indices — typically skipping 60-85% of all work. Worst case (fully
   scattered offsets) degrades to the dense cost, never breaks.

3. **Sequential-grid revisit accumulation** for dV: the whole (S', D) dV block
   stays VMEM-resident per (batch·head), zero-initialised at the first query
   tile and accumulated across the sequential q-tile grid axis.

The backward is a custom VJP (XLA autodiff of the A-construction crashes this
stack's TPU compiler) in two kernels:

- dV (grid (BM, q-tiles)): dV[group] += A_groupᵀ @ g.
- dloc/daw (grid (BM, q-tiles)): each of daw, dx, dy is ⟨g, S⟩ where S is a
  *forward* pass with one bilinear factor swapped for its derivative
  (ty·tx, ty·dtx, dty·tx — attention weight applied at the end):

      daw_p = Σ_d g·S_p    dx_p = aw_p·W·Σ_d g·Sx_p    dy_p = aw_p·H·Σ_d g·Sy_p

Numerics: A is built in fp32 and cast to value.dtype for the MXU contractions
(bf16 on the TPU path; fp32 inputs keep fp32 exactness for the parity tests);
all accumulations are fp32.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GW = int(os.environ.get("ASN_MSDA_GW", "512"))
                 # flat source pixels per group (A-tile lane count), bwd
                 # kernels. Round-4 on-chip sweep (tools/bench_msda_bwd_only,
                 # flagship): 512 → 38.0/46.9 ms (CAViT/CACNN) vs 1024 →
                 # 41.6/48.1, 2048 → 57.4/62.9 — finer activation skipping
                 # beats the extra per-group fixed dot cost. The round-3
                 # "512 loses" result predates the SMEM activation table.
                 # (env override ASN_MSDA_GW for on-chip sweeps)
_GW_FWD = 512    # fwd kernel group width — measured 28.8→23.2 ms/call (CAViT
                 # flagship geometry): smaller tiles skip more, and the fwd
                 # does only ONE dot per group so the extra fixed dot cost is
                 # cheap; the bwd's many dots prefer 1024 (115.6 vs 104.6)
_TQ = 128        # query-tile rows, fwd AND bwd. Bigger fwd tiles were
                 # hypothesised to amortise per-tile fixed cost at CACNN's
                 # Lq=9261 (73 tiles) but LOSE on measurement — the coarser
                 # locality skip dominates: CACNN fwd 18.9 ms at 128,
                 # 21.2 at 512, 35.1 at 256; CAViT 15.1 at 128, 19.5 at 256.
_SENTINEL = -(2 ** 30)

# Tests force interpret mode explicitly; None → interpret off TPU backends.
_FORCE_INTERPRET: bool | None = None


def _interpret() -> bool:
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(spatial_shapes, D: int = 0, Lq: int = 0, P: int = 4,
              dtype_bytes: int = 4, vmem_limit: int = 14 * 2 ** 20) -> bool:
    """Geometry + scoped-VMEM feasibility check.

    The kernels keep whole blocks VMEM-resident per (batch·head) grid instance:
    the (G·1024, D) value / dV blocks, the (Lqp, D) grad/output blocks, the
    packed factor array, the constant coordinate maps, and several (TQ, 1024)
    factor tiles as scratch. Every bm-indexed block is double-buffered by
    Mosaic; the scoped-VMEM ceiling is ~16 MB. Estimate the worst kernel's
    footprint and refuse above `vmem_limit` so the wrapper's matmul fallback
    actually engages instead of failing at compile time."""
    if len(spatial_shapes) == 0 or any(h < 1 or w < 1 for h, w in spatial_shapes):
        return False
    if not (D and Lq):
        return True  # geometry-only query (legacy callers)
    L = len(spatial_shapes)
    S = sum(h * w for h, w in spatial_shapes)
    G = _round_up(S, _GW) // _GW
    TQ, Lqp = _prep_shapes(Lq)
    F = 3 * L * P
    maps_b = 2 * L * G * _GW * 4          # two constant maps/level, single-buffered
    f_b = 2 * F * Lqp * 4                 # packed factors, double-buffered
    v_b = 2 * G * _GW * D * dtype_bytes
    g_b = 2 * Lqp * D * dtype_bytes
    out_fwd = 2 * Lqp * D * dtype_bytes
    dv_out = 2 * G * _GW * D * 4          # fp32 accumulation output
    dq_out = 2 * F * Lqp * dtype_bytes
    tile = TQ * _GW * 4
    # fwd/dv build one A tile (+casts); dq additionally keeps tx/ty/dtx/dty
    # and the 3-stacked variant tile live
    fwd = maps_b + f_b + v_b + out_fwd + 4 * tile
    if _MERGED_BWD:
        # the merged dq+dV kernel (default) runs with a raised Mosaic VMEM
        # ceiling (28 MB requested; the flagship instance measures 17.1 MB);
        # budget its whole-block residency + ~10 factor/z/scratch tiles
        bwd = (maps_b + f_b + v_b + g_b + dq_out + dv_out + 10 * tile)
        return max(fwd, bwd) <= max(vmem_limit, 26 * 2 ** 20)
    bwd_dv = maps_b + f_b + g_b + dv_out + 4 * tile
    bwd_dq = maps_b + f_b + v_b + g_b + dq_out + 8 * tile
    return max(fwd, bwd_dv, bwd_dq) <= vmem_limit


@functools.lru_cache(maxsize=64)
def _plan(spatial_shapes, gw=_GW):
    """Static per-level geometry + constant coordinate maps.

    Returns (G, starts, maps) where maps[l] = (hrow, wcol, hrowf, wcolf):
    int32 + f32 (G, gw) level-local pixel coords of each flat lane, sentinel
    outside. The f32 copies feed the hat-function factor build (tx as
    relu(1−|wcolf−x|) — one sub/abs/rsub/max chain instead of two integer
    compares + two selects + an add per corner pair); the int copies feed the
    exact row/column masks of the corner-gather backward."""
    S = sum(h * w for h, w in spatial_shapes)
    G = _round_up(S, gw) // gw
    s_flat = np.arange(G * gw, dtype=np.int64)
    starts = []
    maps = []
    start = 0
    for (H, W) in spatial_shapes:
        local = s_flat - start
        inside = (local >= 0) & (local < H * W)
        hrow = np.where(inside, local // max(W, 1), _SENTINEL).astype(np.int32)
        wcol = np.where(inside, local % max(W, 1), _SENTINEL).astype(np.int32)
        starts.append(start)
        maps.append((hrow.reshape(G, gw), wcol.reshape(G, gw),
                     hrow.reshape(G, gw).astype(np.float32),
                     wcol.reshape(G, gw).astype(np.float32)))
        start += H * W
    return G, tuple(starts), tuple(maps)


def _prep_shapes(Lq):
    # tiles must be 128-multiples on hardware: factor/gradient blocks are
    # lane-sliced per tile (Mosaic requires provable 128-aligned lane offsets;
    # Lq=100 at 140 px used to produce TQ=104 and fail to compile on TPU)
    TQ = min(_TQ, _round_up(Lq, 128))
    return TQ, _round_up(Lq, TQ)


def _fold_value(value, G, gw=_GW):
    """value (B,S,M,D) → (BM, G·gw, D) flat-padded."""
    B, S, M, D = value.shape
    vb = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)
    return jnp.pad(vb, [(0, 0), (0, G * gw - S), (0, 0)])


def _fold_factors(sampling_locations, attention_weights, spatial_shapes):
    """(loc, aw) → ONE packed factor array, TRANSPOSED and UNPADDED
    (BM, L·3P, Lq) f32, per-level rows [x·W−.5 (P) | y·H−.5 (P) | aw (P)].

    Group-width independent (gw only pads the value block), so the SAME array
    serves the fwd kernel and — saved as the custom-VJP residual in place of
    raw (loc, aw) — the backward: at flagship shapes this drops ~2.7 GB of
    fp32 residuals per step (loc alone is (B,Lq,M,L,P,2) f32 ≈ 216-379 MB per
    call; f is 33-57 MB) without touching numerics, since the bwd previously
    just recomputed this exact array from the saved (loc, aw)."""
    Lq = sampling_locations.shape[1]
    L = len(spatial_shapes)
    BM = sampling_locations.shape[0] * sampling_locations.shape[2]
    loc = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        BM, Lq, L, -1, 2).astype(jnp.float32)
    aw = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        BM, Lq, L, -1).astype(jnp.float32)
    cols = []
    for l, (H, W) in enumerate(spatial_shapes):
        cols += [loc[:, :, l, :, 0] * W - 0.5, loc[:, :, l, :, 1] * H - 0.5,
                 aw[:, :, l, :]]
    # factors ship TRANSPOSED (BM, F, Lq): F≈12-36 on the sublane axis packs
    # ~8× denser than lane-padding F to 128; kernels re-transpose per tile
    return jnp.concatenate(cols, axis=-1).transpose(0, 2, 1)


def _pad_factors(f, Lqp):
    return jnp.pad(f, [(0, 0), (0, 0), (0, Lqp - f.shape[2])])


def _fold_inputs(value, sampling_locations, attention_weights, spatial_shapes,
                 Lqp, G, gw=_GW):
    vb = _fold_value(value, G, gw)
    f = _pad_factors(
        _fold_factors(sampling_locations, attention_weights, spatial_shapes),
        Lqp)
    return vb, f


def _level_factors(f, lvl, P):
    b = lvl * 3 * P
    x = f[:, b:b + P]
    y = f[:, b + P:b + 2 * P]
    aw = f[:, b + 2 * P:b + 3 * P]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    return (x0f.astype(jnp.int32), x - x0f, y0f.astype(jnp.int32), y - y0f,
            aw, x, y)


def _corner_span(x0, y0, H, W, start):
    """Scalar flat-index interval covering every (possibly clipped) corner of
    this tile's sampling points — conservative activation test."""
    xl = jnp.clip(x0, -1, W)
    yl = jnp.clip(y0, -1, H)
    s_lo = jnp.min(yl * W + xl) + start
    s_hi = jnp.max((yl + 1) * W + xl + 1) + start
    return s_lo, s_hi


def _factors_t(hrow, wcol, x0, fx, y0, fy, p, grad, dtype=jnp.float32):
    """tx/ty bilinear one-hot factors on the (TQ, 1024) flat-lane tile for
    point p; out-of-range corners match no map entry (zero padding)."""
    # NOTE (measured, don't retry): building these tiles natively in bf16
    # (mask-cast multiplies, since Mosaic can't relayout i1 masks for 16-bit
    # broadcast-column selects) is ~10% SLOWER than f32 where-selects with a
    # cast at the end — the v5e VPU runs bf16 at fp32 rate plus pack overhead,
    # so the build is op-issue-bound, not VMEM-traffic-bound.
    x0p = x0[:, p:p + 1]
    fxp = fx[:, p:p + 1]
    y0p = y0[:, p:p + 1]
    fyp = fy[:, p:p + 1]
    tx = (jnp.where(wcol == x0p, 1.0 - fxp, 0.0)
          + jnp.where(wcol == x0p + 1, fxp, 0.0)).astype(dtype)
    ty = (jnp.where(hrow == y0p, 1.0 - fyp, 0.0)
          + jnp.where(hrow == y0p + 1, fyp, 0.0)).astype(dtype)
    if not grad:
        return tx, ty, None, None
    dtx = (jnp.where(wcol == x0p + 1, 1.0, 0.0)
           - jnp.where(wcol == x0p, 1.0, 0.0)).astype(dtype)
    dty = (jnp.where(hrow == y0p + 1, 1.0, 0.0)
           - jnp.where(hrow == y0p, 1.0, 0.0)).astype(dtype)
    return tx, ty, dtx, dty


# Each kernel ships exactly TWO coordinate maps per level: the fwd/dv kernels
# take the f32 copies (hat-function A build), the backward kernels the int32
# copies (exact corner masks). Shipping all four to every kernel measured
# +7-13 ms on the BACKWARD kernels (operand-count sensitivity in Mosaic's
# pipeline, far beyond the maps' DMA bytes) — keep the sets disjoint.
_NM = 2  # arrays shipped per level


def _slice_maps(map_refs, lvl, g):
    """Two (1, gw) rows for level lvl — int (hrow, wcol) or f32 (hrowf, wcolf)
    depending on which map set the wrapper shipped."""
    a = map_refs[_NM * lvl][pl.ds(g, 1), :]
    b = map_refs[_NM * lvl + 1][pl.ds(g, 1), :]
    return a, b


def _hat_t(hrowf, wcolf, x, y, p, dtype=jnp.float32):
    """tx/ty bilinear factors as hat functions on the float coordinate maps:
    tx = relu(1 − |wcolf − x_p|) — for integer wcolf this equals the two-corner
    compare build exactly (x−x0 IS fx; the x0+1 corner may differ by 1 ulp),
    in 4 VPU passes instead of 5, with zero padding automatic (the sentinel is
    ~1e9 away from any in-range coordinate)."""
    xp = x[:, p:p + 1]
    yp = y[:, p:p + 1]
    tx = jnp.maximum(1.0 - jnp.abs(wcolf - xp), 0.0).astype(dtype)
    ty = jnp.maximum(1.0 - jnp.abs(hrowf - yp), 0.0).astype(dtype)
    return tx, ty


def _active(span, g, gw=_GW):
    s_lo, s_hi = span
    return (s_hi >= g * gw) & (s_lo < (g + 1) * gw)


def _tile_state(fref, ts, TQ, spatial_shapes, starts, P, pre_t=False):
    """Per-query-tile factors + activation spans for every level.

    pre_t: fref is a 2D (Lqp, F) VMEM scratch — queries on sublanes, filled by
    ONE whole-block transpose per grid instance — so the tile read is a plain
    row slice. The per-tile (F, TQ)→(TQ, F) transpose this replaces measured
    ~4.6 µs PER TILE (~8 ms/call at flagship, 20% of the whole backward);
    shipping the factors pre-transposed from XLA instead measured WORSE
    (+6-8 ms: lane-padding 36→128 quadruples the f block's DMA bytes)."""
    if pre_t:
        # spans are NOT computed: the merged kernels read precomputed
        # activation bits from SMEM instead (see _activation_table) — the
        # per-(tile, level) jnp.min/jnp.max-to-scalar reductions these conds
        # needed measured ~20% of the whole backward
        f = fref[pl.ds(ts, TQ), :]
        return [_level_factors(f, l, P)
                for l in range(len(spatial_shapes))], None
    f = fref[0, :, pl.ds(ts, TQ)].T
    facs = [_level_factors(f, l, P) for l in range(len(spatial_shapes))]
    spans = [_corner_span(fc[0], fc[2], H, W, st)
             for fc, (H, W), st in zip(facs, spatial_shapes, starts)]
    return facs, spans


def _store_dq(dq_ref, ts, TQ, cols, dqnat):
    """Write one query tile of dq. dqnat: natural (TQ, F3) ROW store into a
    (1, Lqp, F3) block — kills the per-tile (TQ, F3)→(F3, TQ) transpose
    (~4.6 µs/tile ≈ 8 ms/call at flagship, the round-4 'noepi' ablation) AND
    the wrapper's XLA-side dq relayout transpose. Costs lane padding F3→128 on
    the output block only (written once per tile, never re-read)."""
    t = jnp.concatenate(cols, axis=1)
    if dqnat:
        dq_ref[0, pl.ds(ts, TQ), :] = t.astype(dq_ref.dtype)
    else:
        dq_ref[0, :, pl.ds(ts, TQ)] = t.T.astype(dq_ref.dtype)


def _build_a(facs, spans, maps, g, TQ, P, gw=_GW):
    """One (TQ, GW) A-tile for flat group g — levels under activation conds."""
    a = jnp.zeros((TQ, gw), jnp.float32)
    for lvl, (x0, fx, y0, fy, aw, x, y) in enumerate(facs):
        def build(a, lvl=lvl, x=x, y=y, aw=aw):
            hrowf, wcolf = _slice_maps(maps, lvl, g)
            for p in range(P):
                tx, ty = _hat_t(hrowf, wcolf, x, y, p)
                a = a + aw[:, p:p + 1] * (ty * tx)
            return a

        a = jax.lax.cond(_active(spans[lvl], g, gw), build, lambda a: a, a)
    return a


def _build_a_act(facs, actref, qt, maps, g, TQ, P, gw=_GW):
    """_build_a with the level conds driven by the SMEM activation table."""
    a = jnp.zeros((TQ, gw), jnp.float32)
    for lvl, (x0, fx, y0, fy, aw, x, y) in enumerate(facs):
        def build(a, lvl=lvl, x=x, y=y, aw=aw):
            hrowf, wcolf = _slice_maps(maps, lvl, g)
            for p in range(P):
                tx, ty = _hat_t(hrowf, wcolf, x, y, p)
                a = a + aw[:, p:p + 1] * (ty * tx)
            return a

        a = jax.lax.cond(actref[0, qt, lvl, g] != 0, build, lambda a: a, a)
    return a


def _expand_ok(spatial_shapes) -> bool:
    """Eligibility for the MXU one-hot expansion A build: every level's rows
    AND columns must index inside one 128-lane factor tile."""
    return all(h <= 127 and w <= 127 for h, w in spatial_shapes)


def _build_a_expand(facs, actref, qt, maps, g, TQ, P, a_dtype, gw=_GW):
    """A-tile via MXU one-hot expansion instead of per-point (TQ, gw) hats.

    The hat factors only depend on the point's own row/column coordinate, so
    build them ONCE per point on small (TQ, 128) row/column index tiles —
    R_p(q, i) = aw_p·hat(y_p(q) − i), C_p(q, j) = hat(x_p(q) − j) — stack the
    P points on sublanes, and EXPAND to the (TQ, gw) group window with two
    MXU dots against the constant one-hot maps E(i, t) = [hrow(t) == i],
    F(j, t) = [wcol(t) == j]. A = Σ_p (R@E) ∘ (C@F). The per-point VPU work
    on full (TQ, gw) tiles (2 hats + weighted accumulate ≈ 11 passes) becomes
    one multiply+add; the hats move to (TQ, 128) tiles that are gw/128×
    smaller. Out-of-range corners: rows i ≥ H match no map entry (hrow < H),
    and the folded-value tail sentinel (~1e9) matches no lane of the iota.

    Eligible when every level grid fits 128 rows/columns (`_expand_ok` —
    flagship: 73/37/19 and 42); the wrapper falls back to `_build_a_act`."""
    a = jnp.zeros((TQ, gw), jnp.float32)
    for lvl, (x0, fx, y0, fy, aw, x, y) in enumerate(facs):
        def build(a, lvl=lvl, x=x, y=y, aw=aw):
            hrowf, wcolf = _slice_maps(maps, lvl, g)
            ids = jax.lax.broadcasted_iota(
                jnp.int32, (128, gw), 0).astype(jnp.float32)
            em = jnp.where(hrowf == ids, 1.0, 0.0).astype(a_dtype)
            fm = jnp.where(wcolf == ids, 1.0, 0.0).astype(a_dtype)
            pids = jax.lax.broadcasted_iota(
                jnp.int32, (P * TQ, 128), 1).astype(jnp.float32)
            if "xnoconcat" in _ABLATE:  # WRONG NUMERICS: compile-crash probe
                ycol = jnp.zeros((P * TQ, 1), jnp.float32) + y[0, 0]
                xcol = ycol
                awcol = ycol
            else:
                ycol = jnp.concatenate([y[:, p:p + 1] for p in range(P)], 0)
                xcol = jnp.concatenate([x[:, p:p + 1] for p in range(P)], 0)
                awcol = jnp.concatenate([aw[:, p:p + 1] for p in range(P)], 0)
            rs = (jnp.maximum(1.0 - jnp.abs(pids - ycol), 0.0)
                  * awcol).astype(a_dtype)
            cs = jnp.maximum(1.0 - jnp.abs(pids - xcol), 0.0).astype(a_dtype)
            # Mosaic requires 32-bit matmul accumulators; the one-hot E/F make
            # the outputs exact copies of rs/cs entries either way
            rx = jax.lax.dot_general(rs, em, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            cx = jax.lax.dot_general(cs, fm, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            h = rx * cx
            for p in range(P):
                a = a + h[p * TQ:(p + 1) * TQ]
            return a

        a = jax.lax.cond(actref[0, qt, lvl, g] != 0, build, lambda a: a, a)
    return a


def _any_hit(spans, g, gw=_GW):
    return functools.reduce(jnp.logical_or,
                            [_active(s, g, gw) for s in spans])


def _activation_table(f, spatial_shapes, starts, TQ, G, gw):
    """(BM, nQ, L+1, G) i32 locality-skip table, computed in XLA.

    Row lvl<L: tile qt's corner-index interval intersects group g at level
    lvl (exactly `_active(_corner_span(...))`); row L: any level hits. The
    merged kernels read these as SMEM scalars for their lax.cond predicates —
    computing the spans in-kernel needs two jnp.min/max-to-scalar vector
    reductions per (tile, level), which measured ~8 ms/call at flagship
    (Mosaic's vector→scalar path), vs ~50 µs once here in XLA."""
    BM, F, Lqp = f.shape
    L = len(spatial_shapes)
    P = F // (3 * L)
    nQ = Lqp // TQ
    gidx = jnp.arange(G, dtype=jnp.int32) * gw
    acts = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        b = lvl * 3 * P
        x0 = jnp.floor(f[:, b:b + P]).astype(jnp.int32)          # (BM,P,Lqp)
        y0 = jnp.floor(f[:, b + P:b + 2 * P]).astype(jnp.int32)
        xl = jnp.clip(x0, -1, W)
        yl = jnp.clip(y0, -1, H)
        s_lo = (yl * W + xl).reshape(BM, P, nQ, TQ).min((1, 3)) + starts[lvl]
        s_hi = ((yl + 1) * W + xl + 1).reshape(BM, P, nQ, TQ).max((1, 3)) \
            + starts[lvl]
        acts.append((s_hi[..., None] >= gidx)
                    & (s_lo[..., None] < gidx + gw))             # (BM,nQ,G)
    act = jnp.stack(acts, axis=2)                                # (BM,nQ,L,G)
    anyh = jnp.any(act, axis=2, keepdims=True)
    return jnp.concatenate([act, anyh], axis=2).astype(jnp.int32)


def _group_list(act):
    """(BM, nQ, 1+G) i32: [n_active, active group ids ascending, padding].

    Lets the gather kernel's group loop run EXACTLY n_active iterations
    (g read from SMEM) instead of testing all G groups — each skipped
    (tile, group) iteration still cost ~0.5 µs of scalar/branch machinery."""
    anyrow = act[:, :, -1]                                       # (BM,nQ,G)
    ng = anyrow.sum(-1, dtype=jnp.int32)
    order = jnp.argsort(1 - anyrow, axis=-1).astype(jnp.int32)
    return jnp.concatenate([ng[..., None], order], axis=-1)


def _fwd_kernel(spatial_shapes, G, starts, TQ, nQ, P, a_dtype, *refs):
    L = len(spatial_shapes)
    fref = refs[0]
    actref = refs[1]               # SMEM (1, nQ, L+1, G) activation table
    glref = refs[2]                # SMEM (1, nQ, 1+G) active-group list
    maps = refs[3:3 + _NM * L]
    vref = refs[3 + _NM * L]
    out_ref = refs[4 + _NM * L]
    ftref = refs[-1]               # scratch (Lqp, F3) f32 — see _tile_state
    D = out_ref.shape[-1]
    ftref[...] = fref[0].T         # ONE whole-block transpose per instance

    def tile(qt, _):
        ts = pl.multiple_of(qt * TQ, TQ)
        facs, _sp = _tile_state(ftref, ts, TQ, spatial_shapes, starts, P,
                                pre_t=True)
        ng = glref[0, qt, 0]

        def group(k, acc):
            g = glref[0, qt, k + 1]
            if _EXPAND_FWD and _expand_ok(spatial_shapes):
                a = _build_a_expand(facs, actref, qt, maps, g, TQ, P,
                                    a_dtype, gw=_GW_FWD)
            else:
                a = _build_a_act(facs, actref, qt, maps, g, TQ, P, gw=_GW_FWD)
            rows = pl.multiple_of(g * _GW_FWD, _GW_FWD)
            vblk = vref[0, pl.ds(rows, _GW_FWD), :].astype(a_dtype)
            return acc + jnp.dot(a.astype(a_dtype), vblk,
                                 preferred_element_type=jnp.float32)

        out_ref[0, pl.ds(ts, TQ), :] = jax.lax.fori_loop(
            0, ng, group, jnp.zeros((TQ, D), jnp.float32)).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nQ, tile, 0)


def _bwd_dv_kernel(spatial_shapes, G, starts, TQ, nQ, P, a_dtype, gw, *refs):
    """dV[group] += A_groupᵀ @ g — the whole per-(batch·head) dV block is
    VMEM-resident for the kernel's single grid step."""
    L = len(spatial_shapes)
    fref = refs[0]
    maps = refs[1:1 + _NM * L]
    gref = refs[1 + _NM * L]
    dvref = refs[2 + _NM * L]
    dvref[0] = jnp.zeros_like(dvref[0])

    def tile(qt, _):
        ts = pl.multiple_of(qt * TQ, TQ)
        facs, spans = _tile_state(fref, ts, TQ, spatial_shapes, starts, P)
        gb = gref[0, pl.ds(ts, TQ), :].astype(a_dtype)

        def group(g, _):
            def scatter(_):
                a = _build_a(facs, spans, maps, g, TQ, P, gw=gw)
                rows = pl.multiple_of(g * gw, gw)
                dvref[0, pl.ds(rows, gw), :] += jax.lax.dot_general(
                    a.astype(a_dtype), gb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0

            return jax.lax.cond(_any_hit(spans, g, gw), scatter, lambda _: 0, 0)

        jax.lax.fori_loop(0, G, group, 0)
        return 0

    jax.lax.fori_loop(0, nQ, tile, 0)


def _bwd_dq_kernel(spatial_shapes, G, starts, TQ, nQ, P, a_dtype, gw, *refs):
    """dA formulation: ONE dot per active group (dA = g @ V'groupᵀ), then every
    (level, point, variant) gradient is an elementwise product with the
    bilinear factors followed by a full-lane reduce."""
    L = len(spatial_shapes)
    fref = refs[0]
    maps = refs[1:1 + _NM * L]
    vref = refs[1 + _NM * L]
    gref = refs[2 + _NM * L]
    dq_ref = refs[3 + _NM * L]

    def tile(qt, _):
        ts = pl.multiple_of(qt * TQ, TQ)
        facs, spans = _tile_state(fref, ts, TQ, spatial_shapes, starts, P)
        gb = gref[0, pl.ds(ts, TQ), :].astype(a_dtype)

        gq = gb.astype(jnp.float32)

        def group(g, S):
            def run(S):
                S = list(S)
                rows = pl.multiple_of(g * gw, gw)
                vblk = vref[0, pl.ds(rows, gw), :].astype(a_dtype)
                for lvl, (x0, fx, y0, fy, aw, _x, _y) in enumerate(facs):
                    def build(S3, lvl=lvl, x0=x0, fx=fx, y0=y0, fy=fy):
                        S3 = list(S3)
                        hrow, wcol = _slice_maps(maps, lvl, g)
                        # ⟨g, forward-with-swapped-factor⟩ per (point, variant):
                        # ALL 3·P variant A-tiles ride ONE M-stacked MXU dot —
                        # Mosaic's per-dot fixed cost (~2 µs regardless of size)
                        # dominates at these shapes, so fewer, taller dots win
                        tiles = []
                        for p in range(P):
                            tx, ty, dtx, dty = _factors_t(
                                hrow, wcol, x0, fx, y0, fy, p, True, a_dtype)
                            tiles += [ty * tx, ty * dtx, dty * tx]
                        abc = jnp.concatenate(tiles, axis=0)
                        s = jnp.dot(abc, vblk,
                                    preferred_element_type=jnp.float32)
                        TQl = abc.shape[0] // (3 * P)
                        for p in range(P):
                            for j in range(3):
                                r = (p * 3 + j) * TQl
                                S3[j * P + p] = S3[j * P + p] + jnp.sum(
                                    gq * s[r:r + TQl], axis=1, keepdims=True)
                        return tuple(S3)

                    base = lvl * 3 * P
                    S3 = tuple(S[base:base + 3 * P])
                    S3 = jax.lax.cond(_active(spans[lvl], g, gw), build,
                                      lambda S3: tuple(S3), S3)
                    S[base:base + 3 * P] = list(S3)
                return tuple(S)

            return jax.lax.cond(_any_hit(spans, g, gw), run, lambda S: tuple(S),
                                tuple(S))

        S = jax.lax.fori_loop(
            0, G, group,
            tuple(jnp.zeros((TQ, 1), jnp.float32) for _ in range(3 * P * L)))
        dxs, dys, das = [], [], []
        for lvl, (H, W) in enumerate(spatial_shapes):
            aw = facs[lvl][4]
            base = lvl * 3 * P
            da = jnp.concatenate([S[base + p] for p in range(P)], axis=1)
            dx = jnp.concatenate([S[base + P + p] for p in range(P)], axis=1)
            dy = jnp.concatenate([S[base + 2 * P + p] for p in range(P)], axis=1)
            das.append(da)
            dxs.append(dx * aw * W)
            dys.append(dy * aw * H)
        dq_ref[0, :, pl.ds(ts, TQ)] = jnp.concatenate(
            dxs + dys + das, axis=1).T.astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nQ, tile, 0)


def _bwd_merged_kernel(spatial_shapes, G, starts, TQ, nQ, P, a_dtype,
                       transposed, gw, dqnat, *refs):
    """dq + dV in ONE kernel: the ty·tx variant tiles the dq gdots already
    build are reused to accumulate per-level A-tiles, and dV is accumulated
    inside each level's active branch — the separate dV kernel's whole factor
    rebuild and its extra g/v block traffic disappear.

    `transposed` (used when D is NOT a 128-multiple): the value block, the dV
    output and an extra gT input ship with D on SUBLANES — D=64 on the lane
    axis makes Mosaic pad every row 64→128, which doubles the two big blocks.
    For D≥128-multiples the natural orientation is strictly smaller (no gT)."""
    L = len(spatial_shapes)
    fref = refs[0]
    actref = refs[1]               # SMEM (1, nQ, L+1, G) activation table
    glref = refs[2]                # SMEM (1, nQ, 1+G) active-group list
    maps = refs[3:3 + _NM * L]
    vref = refs[3 + _NM * L]       # (1, G·GW, D) or transposed (1, D, G·GW)
    gref = refs[4 + _NM * L]       # (1, Lqp, D)
    if transposed:
        gtref = refs[5 + _NM * L]  # (1, D, Lqp)
        dq_ref = refs[6 + _NM * L]
        dv_ref = refs[7 + _NM * L]  # (1, D, G·GW)
    else:
        dq_ref = refs[5 + _NM * L]
        dv_ref = refs[6 + _NM * L]  # (1, G·GW, D)
    ftref = refs[-1]               # scratch (Lqp, F3) f32 — see _tile_state
    dv_ref[0] = jnp.zeros_like(dv_ref[0])
    ftref[...] = fref[0].T         # ONE whole-block transpose per instance

    def tile(qt, _):
        ts = pl.multiple_of(qt * TQ, TQ)
        facs, _sp = _tile_state(ftref, ts, TQ, spatial_shapes, starts, P,
                                pre_t=True)
        gb = gref[0, pl.ds(ts, TQ), :].astype(a_dtype)        # (TQ, D)
        gq = gb.astype(jnp.float32)
        gbt = (gtref[0, :, pl.ds(ts, TQ)].astype(a_dtype)     # (D, TQ)
               if transposed else None)

        def group(g, S):
            def run(S):
                S = list(S)
                rows = pl.multiple_of(g * gw, gw)
                vblk = (vref[0, :, pl.ds(rows, gw)] if transposed
                        else vref[0, pl.ds(rows, gw), :]).astype(a_dtype)
                a = jnp.zeros((TQ, gw), a_dtype)
                for lvl, (x0, fx, y0, fy, aw, _x, _y) in enumerate(facs):
                    def build(carry, lvl=lvl, x0=x0, fx=fx, y0=y0, fy=fy,
                              aw=aw):
                        a, S3 = carry
                        S3 = list(S3)
                        hrow, wcol = _slice_maps(maps, lvl, g)
                        tiles = []
                        for p in range(P):
                            tx, ty, dtx, dty = _factors_t(
                                hrow, wcol, x0, fx, y0, fy, p, True, a_dtype)
                            tiles += [ty * tx, ty * dtx, dty * tx]
                            a = a + aw[:, p:p + 1].astype(a_dtype) * tiles[3 * p]
                        abc = jnp.concatenate(tiles, axis=0)
                        if transposed:
                            s = jax.lax.dot_general(      # q@kᵀ MXU form
                                abc, vblk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        else:
                            s = jnp.dot(abc, vblk,
                                        preferred_element_type=jnp.float32)
                        TQl = abc.shape[0] // (3 * P)
                        for p in range(P):
                            for j in range(3):
                                r = (p * 3 + j) * TQl
                                S3[j * P + p] = S3[j * P + p] + jnp.sum(
                                    gq * s[r:r + TQl], axis=1, keepdims=True)
                        return a, tuple(S3)

                    base = lvl * 3 * P
                    S3 = tuple(S[base:base + 3 * P])
                    a, S3 = jax.lax.cond(actref[0, qt, lvl, g] != 0, build,
                                         lambda c: c, (a, S3))
                    S[base:base + 3 * P] = list(S3)
                # ONE dV dot per active group, from the carried A-tile
                if transposed:
                    dv_ref[0, :, pl.ds(rows, gw)] += jnp.dot(
                        gbt, a, preferred_element_type=jnp.float32
                    ).astype(dv_ref.dtype)
                else:
                    dv_ref[0, pl.ds(rows, gw), :] += jax.lax.dot_general(
                        a, gb, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(dv_ref.dtype)
                return tuple(S)

            return jax.lax.cond(actref[0, qt, L, g] != 0, run,
                                lambda S: tuple(S), tuple(S))

        S = jax.lax.fori_loop(
            0, G, group,
            tuple(jnp.zeros((TQ, 1), jnp.float32) for _ in range(3 * P * L)))
        dxs, dys, das = [], [], []
        for lvl, (H, W) in enumerate(spatial_shapes):
            aw = facs[lvl][4]
            base = lvl * 3 * P
            da = jnp.concatenate([S[base + p] for p in range(P)], axis=1)
            dx = jnp.concatenate([S[base + P + p] for p in range(P)], axis=1)
            dy = jnp.concatenate([S[base + 2 * P + p] for p in range(P)], axis=1)
            das.append(da)
            dxs.append(dx * aw * W)
            dys.append(dy * aw * H)
        _store_dq(dq_ref, ts, TQ, dxs + dys + das, dqnat)
        return 0

    jax.lax.fori_loop(0, nQ, tile, 0)


def _bwd_merged_uform_kernel(spatial_shapes, G, starts, TQ, nQ, P, a_dtype,
                             transposed, gw, dqnat, *refs):
    """u-form merged backward: ONE u = g @ Vᵀ dot per (group, tile) replaces
    the 3·P-stacked variant dot per (group, level).

    Identity: every dq scalar is r = Σ_t T[q,t]·u[q,t] with T a variant tile
    and u[q,t] = Σ_d g[q,d]·V[t,d] — so after the single u dot, daw/dx/dy are
    pure VPU multiply-reduces against the (already built) factor tiles. Dot
    count per group drops from 1+L_active to 2 (u and dV); the trade is 3·P
    full-lane (TQ, gw) reduces per active level on the VPU.

    _REDUCE_DOT: a Mosaic lane-reduce (jnp.sum over the gw axis) costs ~10-20×
    a plain VPU pass — the 3·P reduces per (group, level) dominate this kernel
    (profiled: CAViT merged bwd 80 ms/call ≈ 4.3× its fwd, far above the pass
    count's prediction). With the flag on, the 3·P product tiles instead ride
    ONE M-stacked MXU dot against a ones tile (lane-contraction A@Bᵀ form, in
    a_dtype like every other contraction here), turning 12 lane-reduces into
    one ~2 µs dot per (group, level)."""
    L = len(spatial_shapes)
    fref = refs[0]
    actref = refs[1]               # SMEM (1, nQ, L+1, G) activation table
    glref = refs[2]                # SMEM (1, nQ, 1+G) active-group list
    maps = refs[3:3 + _NM * L]
    vref = refs[3 + _NM * L]       # (1, G·GW, D) or transposed (1, D, G·GW)
    gref = refs[4 + _NM * L]       # (1, Lqp, D)
    if transposed:
        gtref = refs[5 + _NM * L]  # (1, D, Lqp)
        dq_ref = refs[6 + _NM * L]
        dv_ref = refs[7 + _NM * L]  # (1, D, G·GW)
    else:
        dq_ref = refs[5 + _NM * L]
        dv_ref = refs[6 + _NM * L]  # (1, G·GW, D)
    ftref = refs[-1]               # scratch (Lqp, F3) f32 — see _tile_state
    dv_ref[0] = jnp.zeros_like(dv_ref[0])
    ftref[...] = fref[0].T         # ONE whole-block transpose per instance

    def tile(qt, _):
        ts = pl.multiple_of(qt * TQ, TQ)
        facs, _sp = _tile_state(ftref, ts, TQ, spatial_shapes, starts, P,
                                pre_t=True)
        gb = gref[0, pl.ds(ts, TQ), :].astype(a_dtype)        # (TQ, D)
        gbt = (gtref[0, :, pl.ds(ts, TQ)].astype(a_dtype)     # (D, TQ)
               if transposed else None)

        def group(g, S):
            def run(S):
                S = list(S)
                rows = pl.multiple_of(g * gw, gw)
                vblk = (vref[0, :, pl.ds(rows, gw)] if transposed
                        else vref[0, pl.ds(rows, gw), :]).astype(a_dtype)
                if "noudot" in _ABLATE:
                    u = jnp.broadcast_to(gb[:, 0:1].astype(jnp.float32),
                                         (gb.shape[0], gw))
                elif transposed:   # (TQ,D)@(D,gw)
                    u = jax.lax.dot_general(
                        gb, vblk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:            # (TQ,D)@(gw,D)ᵀ — lane-contraction form
                    u = jax.lax.dot_general(
                        gb, vblk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                a = jnp.zeros((TQ, gw), a_dtype)
                for lvl, (x0, fx, y0, fy, aw, _x, _y) in enumerate(facs):
                    def build(carry, lvl=lvl, x0=x0, fx=fx, y0=y0, fy=fy,
                              aw=aw):
                        a, S3 = carry
                        S3 = list(S3)
                        hrow, wcol = _slice_maps(maps, lvl, g)
                        prods = []
                        for p in range(P):
                            tx, ty, dtx, dty = _factors_t(
                                hrow, wcol, x0, fx, y0, fy, p,
                                "nogradfac" not in _ABLATE)
                            c = ty * tx
                            a = a + (aw[:, p:p + 1] * c).astype(a_dtype)
                            if "nogradfac" in _ABLATE:
                                S3[p] = S3[p] + (u * c)[:, 0:1]
                                continue
                            if "noreduce" in _ABLATE:
                                uy = u * ty
                                S3[p] = S3[p] + (u * c)[:, 0:1]
                                S3[P + p] = S3[P + p] + (uy * dtx)[:, 0:1]
                                S3[2 * P + p] = (S3[2 * P + p]
                                                 + ((u * dty) * tx)[:, 0:1])
                                continue
                            uy = u * ty
                            if _REDUCE_DOT:
                                prods += [(u * c).astype(a_dtype),
                                          (uy * dtx).astype(a_dtype),
                                          ((u * dty) * tx).astype(a_dtype)]
                                continue
                            S3[p] = S3[p] + jnp.sum(
                                u * c, axis=1, keepdims=True)
                            S3[P + p] = S3[P + p] + jnp.sum(
                                uy * dtx, axis=1, keepdims=True)
                            S3[2 * P + p] = S3[2 * P + p] + jnp.sum(
                                (u * dty) * tx, axis=1, keepdims=True)
                        if _REDUCE_DOT:
                            stacked = jnp.concatenate(prods, axis=0)
                            ones = jnp.ones((128, gw), a_dtype)
                            s = jax.lax.dot_general(
                                stacked, ones, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            TQl = stacked.shape[0] // (3 * P)
                            for p in range(P):
                                for j in range(3):
                                    r = (p * 3 + j) * TQl
                                    S3[j * P + p] = (S3[j * P + p]
                                                     + s[r:r + TQl, 0:1])
                        return a, tuple(S3)

                    base = lvl * 3 * P
                    S3 = tuple(S[base:base + 3 * P])
                    a, S3 = jax.lax.cond(actref[0, qt, lvl, g] != 0, build,
                                         lambda c: c, (a, S3))
                    S[base:base + 3 * P] = list(S3)
                if "nodv" in _ABLATE:
                    pass
                elif transposed:
                    dv_ref[0, :, pl.ds(rows, gw)] += jnp.dot(
                        gbt, a, preferred_element_type=jnp.float32
                    ).astype(dv_ref.dtype)
                else:
                    dv_ref[0, pl.ds(rows, gw), :] += jax.lax.dot_general(
                        a, gb, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(dv_ref.dtype)
                return tuple(S)

            return jax.lax.cond(actref[0, qt, L, g] != 0, run,
                                lambda S: tuple(S), tuple(S))

        S = jax.lax.fori_loop(
            0, G, group,
            tuple(jnp.zeros((TQ, 1), jnp.float32) for _ in range(3 * P * L)))
        dxs, dys, das = [], [], []
        for lvl, (H, W) in enumerate(spatial_shapes):
            aw = facs[lvl][4]
            base = lvl * 3 * P
            da = jnp.concatenate([S[base + p] for p in range(P)], axis=1)
            dx = jnp.concatenate([S[base + P + p] for p in range(P)], axis=1)
            dy = jnp.concatenate([S[base + 2 * P + p] for p in range(P)], axis=1)
            das.append(da)
            dxs.append(dx * aw * W)
            dys.append(dy * aw * H)
        _store_dq(dq_ref, ts, TQ, dxs + dys + das, dqnat)
        return 0

    jax.lax.fori_loop(0, nQ, tile, 0)


def _bwd_merged_gather_kernel(spatial_shapes, G, starts, TQ, nQ, P, a_dtype,
                              transposed, gw, dqnat, *refs):
    """Corner-gather merged backward — the structural successor to the u-form.

    Every dq scalar only needs u = g·Vᵀ at the point's FOUR bilinear corners:
        daw = Σ_ij w_ij·u[y0+i, x0+j]   dx = Σ_i ty_i·(u[·,x0+1]−u[·,x0])  …
    so instead of building dtx/dty variant tiles and lane-reducing 3·P product
    tiles per (group, level) — measured ~46 of CAViT's ~65 ms bwd — this
    kernel row-masks u by the two corner ROWS (p0 = u·[hrow==y0], one select
    each), contracts ALL 2·P masked tiles against a constant column one-hot
    C_wᵀ[w,t] = [wcol[t]==w] in ONE M-stacked MXU dot (A@Bᵀ lane-contraction
    form), and reads the four corner values with per-row dynamic gathers on
    the resulting (TQ, 128) tiles — a SINGLE 128-lane vreg, which Mosaic's
    gather supports (the cross-vreg case is the documented dead end).

    Eligibility: every level width ≤ 126 so out-of-range corner columns can be
    redirected to the guaranteed-zero lane 127 (flagship widths: 73/37/19/42).
    The wrapper falls back to the u-form kernel otherwise.

    Accumulator state: the masked-u gather tiles z accumulate in a VMEM
    SCRATCH ref zref (L·2P·TQ, 128), zeroed per query tile, NOT in the
    fori_loop/cond carry — carrying tiles through cond boundaries measured
    ~3× the kernel's useful work in the round-3 ablation sweep (per-carried-
    tile select/spill at every (tile, group) step).

    Corner reads happen ONCE per (tile, level, point) AFTER the group loop,
    not per group: z's 128 lanes are the LEVEL-GLOBAL column space (the cwt
    one-hot maps each group-window position to its level column), so summing
    z over a tile's active groups is exact — every group contributes only the
    rows/columns its window covers, disjointly. The round-4 ablation sweep
    measured the in-loop corner reads at 7.6/8.7 ms of CAViT/CACNN's
    40.8/48.7 ms; hoisting them leaves one fixed 4·P·L read set per tile."""
    L = len(spatial_shapes)
    F3 = 3 * L * P
    fref = refs[0]
    actref = refs[1]               # SMEM (1, nQ, L+1, G) activation table
    glref = refs[2]                # SMEM (1, nQ, 1+G) active-group list
    maps = refs[3:3 + _NM * L]
    vref = refs[3 + _NM * L]       # (1, G·GW, D) or transposed (1, D, G·GW)
    gref = refs[4 + _NM * L]       # (1, Lqp, D)
    if transposed:
        gtref = refs[5 + _NM * L]  # (1, D, Lqp)
        dq_ref = refs[6 + _NM * L]
        dv_ref = refs[7 + _NM * L]  # (1, D, G·GW)
    else:
        dq_ref = refs[5 + _NM * L]
        dv_ref = refs[6 + _NM * L]  # (1, G·GW, D)
    zref = refs[-2]                # scratch (L·2P·TQ, 128) f32 z accumulators
    ftref = refs[-1]               # scratch (Lqp, F3) f32
    dv_ref[0] = jnp.zeros_like(dv_ref[0])
    ftref[...] = fref[0].T         # ONE whole-block transpose per instance

    def tile(qt, _):
        ts = pl.multiple_of(qt * TQ, TQ)
        # "tile0state" (WRONG NUMERICS, timing only): loop-invariant factors —
        # isolates the per-tile _tile_state cost (slice+floor chain)
        facs, _sp = _tile_state(
            ftref, 0 if "tile0state" in _ABLATE else ts, TQ,
            spatial_shapes, starts, P, pre_t=True)
        gb = gref[0, pl.ds(ts, TQ), :].astype(a_dtype)        # (TQ, D)
        gbt = (gtref[0, :, pl.ds(ts, TQ)].astype(a_dtype)     # (D, TQ)
               if transposed else None)
        zref[...] = jnp.zeros((L * 2 * P * TQ, 128), jnp.float32)

        ng = glref[0, qt, 0]

        def group(k, _):
            g = glref[0, qt, k + 1]

            def run(_):
                rows = pl.multiple_of(g * gw, gw)
                vblk = (vref[0, :, pl.ds(rows, gw)] if transposed
                        else vref[0, pl.ds(rows, gw), :]).astype(a_dtype)
                if transposed:   # (TQ,D)@(D,gw)
                    u = jax.lax.dot_general(
                        gb, vblk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:            # (TQ,D)@(gw,D)ᵀ — lane-contraction form
                    u = jax.lax.dot_general(
                        gb, vblk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if "noudot" in _ABLATE:  # WRONG NUMERICS: timing only
                    # lane-varying iota: a replicated broadcast here trips a
                    # Mosaic i1-relayout bug in the downstream compares
                    u = gb[:, :1] * jax.lax.broadcasted_iota(
                        jnp.int32, (TQ, gw), 1).astype(jnp.float32)
                ub = u.astype(a_dtype)
                a = jnp.zeros((TQ, gw), a_dtype)
                for lvl, (x0, fx, y0, fy, aw, x, y) in enumerate(facs):
                    base = lvl * 3 * P

                    def build(a, lvl=lvl, x0=x0, fx=fx, y0=y0, fy=fy,
                              aw=aw, x=x, y=y, base=base):
                        if "nobuild" in _ABLATE:  # WRONG NUMERICS: timing only
                            return a + 1.0
                        hrow, wcol = _slice_maps(maps, lvl, g)
                        wids = jax.lax.broadcasted_iota(
                            jnp.int32, (128, gw), 0)
                        cwt = jnp.where(wids == wcol, 1.0, 0.0).astype(a_dtype)
                        ps = []
                        for p in range(P):
                            # A build SHARES the two row masks with the corner
                            # selects below; the hat form measured SLOWER here
                            # (full hat bwd 58.5→70.4 ms, hat-tx-only 66.9 —
                            # the compare/select build is the fast path inside
                            # this kernel; only the fwd/dv kernels keep hat)
                            y0p = y0[:, p:p + 1]
                            fyp = fy[:, p:p + 1]
                            x0p = x0[:, p:p + 1]
                            fxp = fx[:, p:p + 1]
                            m0 = hrow == y0p
                            m1 = hrow == y0p + 1
                            awp = aw[:, p:p + 1]
                            tx = (jnp.where(wcol == x0p, 1.0 - fxp, 0.0)
                                  + jnp.where(wcol == x0p + 1, fxp, 0.0))
                            # aw folded into the ty select COLUMNS (TQ, 1):
                            # saves one full-(TQ, gw) multiply per point
                            ty = (jnp.where(m0, awp * (1.0 - fyp), 0.0)
                                  + jnp.where(m1, awp * fyp, 0.0))
                            a = a + (ty * tx).astype(a_dtype)
                            zero = jnp.zeros((), a_dtype)
                            ps += [jnp.where(m0, ub, zero),
                                   jnp.where(m1, ub, zero)]
                        if "nozdot" in _ABLATE:  # WRONG NUMERICS: timing only
                            return a
                        z = jax.lax.dot_general(
                            jnp.concatenate(ps, axis=0), cwt,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (2P·TQ, 128)
                        # accumulate into the level's z scratch; corner reads
                        # happen once per tile AFTER the group loop (z's lanes
                        # are level-global columns, so the group sum is exact)
                        off = lvl * 2 * P * TQ
                        zref[pl.ds(off, 2 * P * TQ), :] += z
                        return a

                    a = jax.lax.cond(actref[0, qt, lvl, g] != 0, build,
                                     lambda a: a, a)
                if "nodvdot" in _ABLATE:  # WRONG NUMERICS
                    pass
                elif transposed:
                    dv_ref[0, :, pl.ds(rows, gw)] += jnp.dot(
                        gbt, a, preferred_element_type=jnp.float32
                    ).astype(dv_ref.dtype)
                else:
                    dv_ref[0, pl.ds(rows, gw), :] += jax.lax.dot_general(
                        a, gb, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(dv_ref.dtype)
                return 0

            return run(0)

        jax.lax.fori_loop(0, ng, group, 0)
        # Corner reads as masked 128-lane reduces on the accumulated z tiles,
        # once per (level, point). Measured dead ends for the read form
        # (round 3, in-loop era — the tile shapes are unchanged):
        # (a) dynamic_gather ~4x slower; (b) stacking all 4P corner reads
        # into (2P*TQ, 1) column algebra is 60% SLOWER ((N, 1) tiles are
        # sublane-only vregs at 1/128 lane utilization); (c) folding the
        # x-weights into the z tiles and contracting against ones in ONE
        # stacked MXU dot is +8%. Out-of-range corners match no lane -> 0.
        zids = jax.lax.broadcasted_iota(jnp.int32, (TQ, 128), 1)
        dxs, dys, das = [], [], []
        for lvl, (H, W) in enumerate(spatial_shapes):
            x0, fx, y0, fy, aw, x, y = facs[lvl]
            off = lvl * 2 * P * TQ
            da_p, dx_p, dy_p = [], [], []
            for p in range(P):
                if "nocorner" in _ABLATE:  # WRONG NUMERICS: timing only
                    zc = zref[pl.ds(off + 2 * p * TQ, TQ), :1]
                    da_p.append(zc)
                    dx_p.append(zc)
                    dy_p.append(zc)
                    continue
                z0 = zref[pl.ds(off + 2 * p * TQ, TQ), :]
                z1 = zref[pl.ds(off + (2 * p + 1) * TQ, TQ), :]
                x0p = x0[:, p:p + 1]
                fxp = fx[:, p:p + 1]
                fyp = fy[:, p:p + 1]
                m0 = zids == x0p
                m1 = zids == x0p + 1
                zero = jnp.zeros((), jnp.float32)
                u00 = jnp.sum(jnp.where(m0, z0, zero), axis=1, keepdims=True)
                u01 = jnp.sum(jnp.where(m1, z0, zero), axis=1, keepdims=True)
                u10 = jnp.sum(jnp.where(m0, z1, zero), axis=1, keepdims=True)
                u11 = jnp.sum(jnp.where(m1, z1, zero), axis=1, keepdims=True)
                gy = 1.0 - fyp
                gx = 1.0 - fxp
                # t1 - t0 == gx(u10-u00) + fx(u11-u01): dy rides the same
                # interpolants as da
                t0 = gx * u00 + fxp * u01
                t1 = gx * u10 + fxp * u11
                da_p.append(gy * t0 + fyp * t1)
                dx_p.append(gy * (u01 - u00) + fyp * (u11 - u10))
                dy_p.append(t1 - t0)
            das.append(jnp.concatenate(da_p, axis=1))
            dxs.append(jnp.concatenate(dx_p, axis=1) * aw * W)
            dys.append(jnp.concatenate(dy_p, axis=1) * aw * H)
        if "noepi" in _ABLATE:  # WRONG NUMERICS: per-tile epilogue cost
            if dqnat:
                dq_ref[0, pl.ds(ts, TQ), :] = jnp.zeros(
                    (TQ, F3), dq_ref.dtype)
            else:
                dq_ref[0, :, pl.ds(ts, TQ)] = jnp.zeros(
                    (F3, TQ), dq_ref.dtype)
        else:
            _store_dq(dq_ref, ts, TQ, dxs + dys + das, dqnat)
        return 0

    jax.lax.fori_loop(0, nQ, tile, 0)


# Library defaults = the measured-best configuration on v5e (see BASELINE.md
# rounds 2-3): ONE merged dq+dV kernel per call, corner-gather dq form where
# every level is ≤128 lanes wide, u-form otherwise. The toggles remain for
# A/B benchmarking (tools/bench_msda.py) and the regression tests.
_MERGED_BWD = True
# MXU one-hot expansion A build (_build_a_expand) — measured DEAD END on v5e
# (round 4): fwd 17.3/21.5 ms vs the hat build's 14.0/17.0 at flagship
# geometries, even with the stack concats stubbed out — the 2 expansion dots
# per (group, level) serialize with the VPU build at ~2 µs issue latency each,
# eating the saved VPU passes. Also: concatenating (TQ, 1) column slices on
# SUBLANES inside a kernel crashes the Mosaic backend (HTTP 500, post-verify);
# keep such stacks out of kernels. Flag kept for A/B reproduction.
_EXPAND_FWD = False
_UFORM_BWD = True
_REDUCE_DOT = False  # u-form: lane-reduces as ONE stacked MXU ones-dot
# dq in natural (BM, Lqp, 3LP) layout straight from the merged kernels (see
# _store_dq) — measured NO WIN on-chip (round 4): 42.7/52.7 vs 41.6/48.1 ms at
# GW=1024, 38.3/47.1 vs 38.0/46.9 at GW=512. The per-tile (TQ,F3)→(F3,TQ)
# transpose it removes is NOT the epilogue's cost — the F3→128 lane-padded row
# store writes ~3.5× the bytes and eats the saving. Kept for A/B reproduction.
_DQNAT = os.environ.get("ASN_MSDA_DQNAT", "0") != "0"
# dev-only timing ablations for the u-form merged kernel (WRONG numerics):
# "noreduce" | "nogradfac" | "nodv" | "noudot" — isolate each cost component
_ABLATE = os.environ.get("ASN_MSDA_ABLATE", "")
_TQ_BWD = int(os.environ.get("ASN_MSDA_TQ_BWD", "0"))
                 # optional bwd query-tile override (must divide Lqp)


def use_expand_fwd(on: bool) -> None:
    global _EXPAND_FWD
    _EXPAND_FWD = on


def use_reduce_dot(on: bool) -> None:
    global _REDUCE_DOT
    _REDUCE_DOT = on


_GATHER_BWD = True   # corner-gather merged backward (see its kernel docstring)


def use_gather_bwd(on: bool) -> None:
    global _GATHER_BWD
    _GATHER_BWD = on


def _gather_ok(spatial_shapes) -> bool:
    # one-vreg corner reads need every level width ≤ 128 (the z tiles hold one
    # level row per 128 lanes; wider levels would span vregs)
    return all(w <= 128 for _, w in spatial_shapes)


def use_uform_bwd(on: bool) -> None:
    global _UFORM_BWD
    _UFORM_BWD = on


def use_merged_bwd(on: bool) -> None:
    global _MERGED_BWD
    _MERGED_BWD = on


def _full_spec(rows, lastdim):
    return pl.BlockSpec((1, rows, lastdim), lambda bm: (bm, 0, 0),
                        memory_space=pltpu.VMEM)


def _fspec(F, Lqp):
    return pl.BlockSpec((1, F, Lqp), lambda bm: (bm, 0, 0),
                        memory_space=pltpu.VMEM)


def _map_args(maps, kind, two_idx=False):
    """Constant coordinate maps as kernel inputs (pallas forbids captures).

    kind='float' ships (hrowf, wcolf) for the hat-function A build (fwd/dv
    kernels); kind='int' ships (hrow, wcol) for the exact corner masks (bwd
    kernels). Disjoint on purpose — see the _NM comment. two_idx=True emits
    index maps for the (B, M) grid of the flat-2D layout."""
    args = []
    for hrow, wcol, hrowf, wcolf in maps:
        if kind == "float":
            args += [jnp.asarray(hrowf), jnp.asarray(wcolf)]
        else:
            args += [jnp.asarray(hrow), jnp.asarray(wcol)]
    idx = (lambda b, m: (0, 0)) if two_idx else (lambda bm: (0, 0))
    specs = [pl.BlockSpec(a.shape, idx, memory_space=pltpu.VMEM)
             for a in args]
    return args, specs


def _flat2d(D: int) -> bool:
    """True → values/gradients/outputs cross the kernel boundary in their
    NATURAL (B, rows, M·D) layout, with the per-(b, m) slab selected by a
    128-aligned lane-slice BlockSpec over a (B, M) grid instead of being
    physically transposed to (B·M, rows, D) first. At the flagship geometry
    the four relayout copies this kills (value fold ~9.8 ms, incoming-grad
    fold ~7.8 ms, fwd-out unfold, dV unfold) cost ~20 ms/step; a 128-lane
    slice of a (8, 128)-tiled array is whole tiles, so the strided DMA runs
    at full bandwidth. Requires D to be a lane multiple."""
    return D % 128 == 0


def _lane_spec(rows: int, D: int):
    """(1, rows, D) block of a (B, rows, M·D) array at lane offset m·D."""
    return pl.BlockSpec((1, rows, D), lambda b, m: (b, 0, m),
                        memory_space=pltpu.VMEM)


def _bm_specs(M, f, Lqp, act, gl):
    """(B, M)-grid versions of the standard BM-major input specs."""
    f_spec = pl.BlockSpec((1, f.shape[1], Lqp), lambda b, m: (b * M + m, 0, 0),
                          memory_space=pltpu.VMEM)
    act_spec = pl.BlockSpec((1,) + act.shape[1:],
                            lambda b, m: (b * M + m, 0, 0, 0),
                            memory_space=pltpu.SMEM) if act is not None else None
    gl_spec = pl.BlockSpec((1,) + gl.shape[1:], lambda b, m: (b * M + m, 0, 0),
                           memory_space=pltpu.SMEM) if gl is not None else None
    return f_spec, act_spec, gl_spec


def _fwd_impl(value, sampling_locations, attention_weights, spatial_shapes,
              return_f=False):
    B, S, M, D = value.shape
    Lq = sampling_locations.shape[1]
    P = sampling_locations.shape[4]
    BM = B * M
    TQ, Lqp = _prep_shapes(Lq)
    G, starts, maps = _plan(spatial_shapes, _GW_FWD)
    flat2d = _flat2d(D)
    if flat2d:
        vb = jnp.pad(value.reshape(B, S, M * D),
                     [(0, 0), (0, G * _GW_FWD - S), (0, 0)])
    else:
        vb = _fold_value(value, G, gw=_GW_FWD)
    f_raw = _fold_factors(sampling_locations, attention_weights,
                          spatial_shapes)
    f = _pad_factors(f_raw, Lqp)

    act = _activation_table(f, spatial_shapes, starts, TQ, G, _GW_FWD)
    gl = _group_list(act)
    kern = functools.partial(_fwd_kernel, spatial_shapes, G, starts, TQ,
                             Lqp // TQ, P, value.dtype)
    common = dict(
        scratch_shapes=[pltpu.VMEM((Lqp, f.shape[1]), jnp.float32)],
        # headroom for the one-hot-expansion A build's (P·TQ, gw) stacks
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 2 ** 20),
        interpret=_interpret(),
    )
    map_args, map_specs = _map_args(maps, "float", two_idx=flat2d)
    if flat2d:
        f_spec, act_spec, gl_spec = _bm_specs(M, f, Lqp, act, gl)
        out = pl.pallas_call(
            kern, grid=(B, M),
            in_specs=[f_spec, act_spec, gl_spec] + map_specs
            + [_lane_spec(G * _GW_FWD, D)],
            out_specs=_lane_spec(Lqp, D),
            out_shape=jax.ShapeDtypeStruct((B, Lqp, M * D), value.dtype),
            **common,
        )(f, act, gl, *map_args, vb)
        out = out[:, :Lq].astype(jnp.float32)
        return (out, f_raw, vb) if return_f else out
    out = pl.pallas_call(
        kern,
        grid=(BM,),
        in_specs=[_fspec(f.shape[1], Lqp),
                  pl.BlockSpec((1,) + act.shape[1:],
                               lambda bm: (bm, 0, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1,) + gl.shape[1:], lambda bm: (bm, 0, 0),
                               memory_space=pltpu.SMEM)] + map_specs
        + [_full_spec(G * _GW_FWD, D)],
        out_specs=_full_spec(Lqp, D),
        out_shape=jax.ShapeDtypeStruct((BM, Lqp, D), value.dtype),
        **common,
    )(f, act, gl, *map_args, vb)
    out = out[:, :Lq].reshape(B, M, Lq, D).transpose(0, 2, 1, 3)
    out = out.reshape(B, Lq, M * D).astype(jnp.float32)
    return (out, f_raw, vb) if return_f else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def msda_pallas(value, sampling_locations, attention_weights, spatial_shapes):
    """value (B,S,M,D); loc (B,Lq,M,L,P,2) in [0,1]; aw (B,Lq,M,L,P).
    Returns (B, Lq, M*D) fp32."""
    return _fwd_impl(value, sampling_locations, attention_weights,
                     tuple(map(tuple, spatial_shapes)))


def _msda_fwd(value, sampling_locations, attention_weights, spatial_shapes):
    out, f, vb = _fwd_impl(value, sampling_locations, attention_weights,
                           tuple(map(tuple, spatial_shapes)), return_f=True)
    # residuals: (folded value block, packed factors f, dtype carriers) — NOT
    # the raw (value, loc, aw): the backward only ever consumed their
    # _fold_value/_fold_factors images (f is ~7-10× smaller than fp32 loc+aw
    # at flagship shapes — ~2.7 GB/step of residuals saved), and reusing the
    # forward's vb kills a 58-231 MB relayout per call in the backward
    # (identical numerics in all cases). The loc dtype carrier's SHAPE
    # statically encodes (M, flat2d-layout) so the backward can interpret vb.
    M = value.shape[2]
    return out, (vb, f,
                 jnp.zeros((M, int(_flat2d(value.shape[3])), 0),
                           sampling_locations.dtype),
                 jnp.zeros((0,), attention_weights.dtype))


def _msda_bwd(spatial_shapes, res, grad):
    vb, f_raw, loc_dt, aw_dt = res
    spatial_shapes = tuple(map(tuple, spatial_shapes))
    S = sum(h * w for h, w in spatial_shapes)
    L = len(spatial_shapes)
    B = grad.shape[0]
    M = loc_dt.shape[0]
    flat = loc_dt.shape[1] == 1          # vb/g/dv in (B, rows, M·D) layout
    D = vb.shape[2] // M if flat else vb.shape[2]
    Lq = f_raw.shape[2]
    P = f_raw.shape[1] // (3 * L)
    BM = B * M
    TQ, Lqp = _prep_shapes(Lq)
    gw = _GW
    G, starts, maps = _plan(spatial_shapes, gw)
    # the forward's vb is flat-padded to round_up(S, _GW_FWD); extend the tail
    # zeros if the bwd group width needs more (equal at all flagship shapes)
    if vb.shape[1] < G * gw:
        vb = jnp.pad(vb, [(0, 0), (0, G * gw - vb.shape[1]), (0, 0)])
    if flat and not _MERGED_BWD:
        # the split-kernel ablation baseline keeps the BM-major layout:
        # un-flatten the flat residual once (relayout only on this path)
        vb = vb.reshape(B, -1, M, D).transpose(0, 2, 1, 3).reshape(
            BM, -1, D)
        flat = False
    f = _pad_factors(f_raw, Lqp)
    if flat:
        # natural layout: no incoming-grad fold — the kernels lane-slice it
        g = jnp.pad(grad.astype(vb.dtype), [(0, 0), (0, Lqp - Lq), (0, 0)])
    else:
        g = grad.reshape(B, Lq, M, D).transpose(0, 2, 1, 3).reshape(BM, Lq, D)
        # ship g (and the dq outputs) in vb.dtype: halves the whole-Lqp VMEM
        # blocks on the bf16 path; the fp32 parity path is unchanged
        g = jnp.pad(g.astype(vb.dtype), [(0, 0), (0, Lqp - Lq), (0, 0)])

    map_args, map_specs = _map_args(maps, "int", two_idx=flat)
    # the dq kernel keeps ~6 (TQ, 1024) factor tensors live — halve its tile
    # when TQ is large (lane-sliced factor reads need 128-multiples, so never
    # below 128; tiny interpret-mode shapes keep TQ as-is)
    TQd = TQ if TQ <= 128 else max(128, TQ // 2)
    if _TQ_BWD and Lqp % _TQ_BWD == 0:
        TQd = _TQ_BWD
    if _MERGED_BWD:
        transposed = D % 128 != 0
        act = _activation_table(f, spatial_shapes, starts, TQd, G, gw)
        gl = _group_list(act)
        dqnat = _DQNAT
        dq_blk = (1, Lqp, 3 * L * P) if dqnat else (1, 3 * L * P, Lqp)
        if flat:
            grid = (B, M)
            f_spec, act_spec, gl_spec = _bm_specs(M, f, Lqp, act, gl)
            dq_spec = pl.BlockSpec(dq_blk, lambda b, m: (b * M + m, 0, 0),
                                   memory_space=pltpu.VMEM)
            ins = [f, act, gl, *map_args, vb, g]
            in_specs = [f_spec, act_spec, gl_spec] + map_specs + [
                _lane_spec(G * gw, D), _lane_spec(Lqp, D)]
            dv_spec, dv_shape = _lane_spec(G * gw, D), (B, G * gw, M * D)
        else:
            grid = (BM,)
            dq_spec = pl.BlockSpec(dq_blk, lambda bm: (bm, 0, 0),
                                   memory_space=pltpu.VMEM)
            act_spec = pl.BlockSpec((1,) + act.shape[1:],
                                    lambda bm: (bm, 0, 0, 0),
                                    memory_space=pltpu.SMEM)
            gl_spec = pl.BlockSpec((1,) + gl.shape[1:], lambda bm: (bm, 0, 0),
                                   memory_space=pltpu.SMEM)
            if transposed:
                ins = [f, act, gl, *map_args, vb.transpose(0, 2, 1), g,
                       g.transpose(0, 2, 1)]
                in_specs = [_fspec(f.shape[1], Lqp), act_spec, gl_spec] \
                    + map_specs + [
                    _fspec(D, G * gw), _full_spec(Lqp, D), _fspec(D, Lqp)]
                dv_spec, dv_shape = _fspec(D, G * gw), (BM, D, G * gw)
            else:
                ins = [f, act, gl, *map_args, vb, g]
                in_specs = [_fspec(f.shape[1], Lqp), act_spec, gl_spec] \
                    + map_specs + [
                    _full_spec(G * gw, D), _full_spec(Lqp, D)]
                dv_spec, dv_shape = _full_spec(G * gw, D), (BM, G * gw, D)
        if _GATHER_BWD and _gather_ok(spatial_shapes):
            kern = _bwd_merged_gather_kernel
        elif _UFORM_BWD:
            kern = _bwd_merged_uform_kernel
        else:
            kern = _bwd_merged_kernel
        dq, dv = pl.pallas_call(
            functools.partial(kern, spatial_shapes, G, starts, TQd,
                              Lqp // TQd, P, vb.dtype, transposed, gw, dqnat),
            grid=grid,
            in_specs=in_specs,
            out_specs=[dq_spec, dv_spec],
            out_shape=[jax.ShapeDtypeStruct((BM,) + dq_blk[1:], vb.dtype),
                       jax.ShapeDtypeStruct(dv_shape, vb.dtype)],
            # (3LP, TQ, 1) accumulator scratch for the gather kernel (the
            # uform/plain merged kernels receive and ignore it) — see the
            # gather kernel's docstring on why this must NOT be a loop carry —
            # plus the (Lqp, 3LP) transposed-factor block all merged kernels
            # fill once per grid instance (see _tile_state pre_t)
            scratch_shapes=[pltpu.VMEM((L * 2 * P * TQd, 128), jnp.float32),
                            pltpu.VMEM((Lqp, 3 * L * P), jnp.float32)],
            # the flagship CAViT instance needs ~17.1 MB scoped VMEM — above
            # Mosaic's 16 MB default but well within the chip's physical VMEM
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 2 ** 20),
            interpret=_interpret(),
        )(*ins)
        if transposed:
            dv = dv.transpose(0, 2, 1)
        dq = dq.astype(jnp.float32)
        if not dqnat:
            dq = dq.transpose(0, 2, 1)
        dx = dq[:, :, :L * P]
        dy = dq[:, :, L * P:2 * L * P]
        da = dq[:, :, 2 * L * P:]
        if flat:
            # already (B, rows, M·D): row-slice + free reshape, no transpose
            dv = dv.astype(jnp.float32)[:, :S].reshape(B, S, M, D)
        else:
            dv = dv.astype(jnp.float32)[:, :S].reshape(
                B, M, S, D).transpose(0, 2, 1, 3)

        def unfold_qm(t):
            return t[:, :Lq].reshape(B, M, Lq, L, P).transpose(0, 2, 1, 3, 4)

        dloc = jnp.stack([unfold_qm(dx), unfold_qm(dy)], axis=-1)
        daw = unfold_qm(da)
        return (dv.astype(vb.dtype), dloc.astype(loc_dt.dtype),
                daw.astype(aw_dt.dtype))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, spatial_shapes, G, starts, TQd,
                          Lqp // TQd, P, vb.dtype, gw),
        grid=(BM,),
        in_specs=[_fspec(f.shape[1], Lqp)] + map_specs
        + [_full_spec(G * gw, D), _full_spec(Lqp, D)],
        out_specs=_fspec(3 * L * P, Lqp),
        out_shape=jax.ShapeDtypeStruct((BM, 3 * L * P, Lqp), vb.dtype),
        interpret=_interpret(),
    )(f, *map_args, vb, g)
    dq = dq.astype(jnp.float32).transpose(0, 2, 1)
    dx = dq[:, :, :L * P]
    dy = dq[:, :, L * P:2 * L * P]
    da = dq[:, :, 2 * L * P:]

    # the dv kernel's A build is the hat-function form → float maps
    fmap_args, fmap_specs = _map_args(maps, "float")
    dv = pl.pallas_call(
        functools.partial(_bwd_dv_kernel, spatial_shapes, G, starts, TQ,
                          Lqp // TQ, P, vb.dtype, gw),
        grid=(BM,),
        in_specs=[_fspec(f.shape[1], Lqp)] + fmap_specs
        + [_full_spec(Lqp, D)],
        out_specs=_full_spec(G * gw, D),
        out_shape=jax.ShapeDtypeStruct((BM, G * gw, D), jnp.float32),
        interpret=_interpret(),
    )(f, *fmap_args, g)

    dv = dv[:, :S].reshape(B, M, S, D).transpose(0, 2, 1, 3)

    def unfold_q(t):
        # (BM, Lqp, L·P) → (B, Lq, M, L, P)
        return t[:, :Lq].reshape(B, M, Lq, L, P).transpose(0, 2, 1, 3, 4)

    dloc = jnp.stack([unfold_q(dx), unfold_q(dy)], axis=-1)
    daw = unfold_q(da)
    return (dv.astype(vb.dtype), dloc.astype(loc_dt.dtype),
            daw.astype(aw_dt.dtype))


msda_pallas.defvjp(_msda_fwd, _msda_bwd)
