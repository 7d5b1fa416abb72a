"""Pallas MSDA kernel (interpret mode on CPU): forward + all gradients vs the
gather core's autodiff, including out-of-bounds locations, multi-level group
straddling, and the module-level dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import adaptersis_tpu.ops.msda_pallas as mp
from adaptersis_tpu.ops.ms_deform_attn import ms_deform_attn_core


@pytest.fixture(autouse=True)
def _force_interpret():
    # interpret mode + split-kernel baseline (the library defaults are the
    # merged corner-gather backward; these tests toggle variants explicitly)
    saved = (mp._MERGED_BWD, mp._UFORM_BWD, mp._GATHER_BWD)
    mp._FORCE_INTERPRET = True
    mp.use_merged_bwd(False)
    mp.use_uform_bwd(False)
    mp.use_gather_bwd(False)
    yield
    mp._FORCE_INTERPRET = None
    mp._MERGED_BWD, mp._UFORM_BWD, mp._GATHER_BWD = saved


@pytest.mark.parametrize("shapes,Lq", [
    ([(8, 8), (4, 4), (2, 2)], 9),     # multi-level, groups straddle levels
    ([(6, 5)], 12),                     # non-square single level
    ([(40, 37)], 20),                   # > one 1024-lane group per level
])
def test_pallas_msda_matches_gather_fwd_and_grads(shapes, Lq):
    rng = np.random.default_rng(0)
    L = len(shapes)
    B, M, D, P = 2, 2, 8, 4
    S = sum(h * w for h, w in shapes)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Lq, M, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), jnp.float32)

    a = ms_deform_attn_core(v, shapes, loc, aw)
    b = mp.msda_pallas(v, loc, aw, tuple(shapes))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    t = jnp.asarray(rng.standard_normal(a.shape), jnp.float32)
    g1 = jax.grad(lambda v_, l_, w_: (ms_deform_attn_core(v_, shapes, l_, w_) * t).sum(),
                  argnums=(0, 1, 2))(v, loc, aw)
    g2 = jax.grad(lambda v_, l_, w_: (mp.msda_pallas(v_, l_, w_, tuple(shapes)) * t).sum(),
                  argnums=(0, 1, 2))(v, loc, aw)
    for i, (x, y) in enumerate(zip(g1, g2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4, err_msg=f"grad {i}")


@pytest.mark.parametrize("shapes,Lq,D", [
    ([(8, 8), (4, 4), (2, 2)], 9, 8),    # D<128 → transposed v/dV layout
    ([(40, 37)], 20, 8),
    ([(8, 8), (4, 4)], 9, 128),          # D=128 → natural layout, no gT
])
def test_merged_bwd_matches_split(shapes, Lq, D):
    """The merged dq+dV kernel must produce the same gradients as the split
    two-kernel backward (fp32 path: bit-identical accumulation order per
    group, so tight tolerances). Covers both VMEM orientations."""
    rng = np.random.default_rng(3)
    L = len(shapes)
    B, M, P = 2, 2, 4
    S = sum(h * w for h, w in shapes)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Lq, M, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, Lq, M * D)), jnp.float32)

    def loss(v_, l_, w_):
        return (mp.msda_pallas(v_, l_, w_, tuple(shapes)) * t).sum()

    g_split = jax.grad(loss, argnums=(0, 1, 2))(v, loc, aw)
    mp.use_merged_bwd(True)
    try:
        g_merged = jax.grad(loss, argnums=(0, 1, 2))(v, loc, aw)
    finally:
        mp.use_merged_bwd(False)
    for i, (x, y) in enumerate(zip(g_split, g_merged)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5, err_msg=f"grad {i}")


@pytest.mark.parametrize("shapes,Lq,D", [
    ([(8, 8), (4, 4), (2, 2)], 9, 8),    # D<128 → transposed v/dV layout
    ([(40, 37)], 20, 8),
    ([(8, 8), (4, 4)], 9, 128),          # D=128 → natural layout, no gT
])
def test_uform_bwd_matches_split(shapes, Lq, D):
    """The u-form merged backward (one u = g·Vᵀ dot per group; dq scalars as
    VPU multiply-reduces) must match the split backward. u is a dot-product
    reassociation of the split path's per-variant dots, so fp32 tolerances
    are loose-ish (1e-4) rather than bit-tight."""
    rng = np.random.default_rng(7)
    L = len(shapes)
    B, M, P = 2, 2, 4
    S = sum(h * w for h, w in shapes)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Lq, M, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, Lq, M * D)), jnp.float32)

    def loss(v_, l_, w_):
        return (mp.msda_pallas(v_, l_, w_, tuple(shapes)) * t).sum()

    g_split = jax.grad(loss, argnums=(0, 1, 2))(v, loc, aw)
    mp.use_merged_bwd(True)
    mp.use_uform_bwd(True)
    try:
        g_uform = jax.grad(loss, argnums=(0, 1, 2))(v, loc, aw)
    finally:
        mp.use_merged_bwd(False)
        mp.use_uform_bwd(False)
    for i, (x, y) in enumerate(zip(g_split, g_uform)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4, err_msg=f"grad {i}")


@pytest.mark.parametrize("shapes,Lq,D", [
    ([(8, 8), (4, 4), (2, 2)], 9, 8),    # D<128 → transposed v/dV layout
    ([(40, 37)], 20, 8),
    ([(8, 8), (4, 4)], 9, 128),          # D=128 → natural layout, no gT
])
def test_gather_bwd_matches_split(shapes, Lq, D):
    """The corner-gather merged backward (dq from u at the four bilinear
    corners via one stacked C_wᵀ dot + masked 128-lane reads) must match the
    split backward; includes far out-of-range sampling points (clipped
    corners must contribute zero)."""
    rng = np.random.default_rng(11)
    L = len(shapes)
    B, M, P = 2, 2, 4
    S = sum(h * w for h, w in shapes)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.6, 1.6, (B, Lq, M, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, Lq, M * D)), jnp.float32)

    def loss(v_, l_, w_):
        return (mp.msda_pallas(v_, l_, w_, tuple(shapes)) * t).sum()

    g_split = jax.grad(loss, argnums=(0, 1, 2))(v, loc, aw)
    mp.use_merged_bwd(True)
    mp.use_gather_bwd(True)
    try:
        g_gather = jax.grad(loss, argnums=(0, 1, 2))(v, loc, aw)
    finally:
        mp.use_merged_bwd(False)
        mp.use_gather_bwd(False)
    for i, (x, y) in enumerate(zip(g_split, g_gather)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4, err_msg=f"grad {i}")


def test_gather_bwd_falls_back_on_wide_levels():
    """Level width > 128 → _gather_ok false → the u-form/merged kernel runs
    (still correct)."""
    shapes = [(3, 200)]
    rng = np.random.default_rng(13)
    B, M, D, P, Lq = 1, 1, 8, 2, 7
    v = jnp.asarray(rng.standard_normal((B, 600, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, 1, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, 1, P)), jnp.float32)
    assert not mp._gather_ok(tuple(map(tuple, shapes)))

    def loss(v_):
        return mp.msda_pallas(v_, loc, aw, tuple(shapes)).sum()

    g0 = jax.grad(loss)(v)
    mp.use_merged_bwd(True)
    mp.use_gather_bwd(True)
    try:
        g1 = jax.grad(loss)(v)
    finally:
        mp.use_merged_bwd(False)
        mp.use_gather_bwd(False)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-5)


def test_pallas_module_dispatch_matches_gather():
    from adaptersis_tpu.models.adapters import get_reference_points
    from adaptersis_tpu.ops.ms_deform_attn import MSDeformAttn

    shapes = [(6, 6), (3, 3)]
    S = sum(h * w for h, w in shapes)
    q = jnp.ones((1, 5, 32))
    feat = jnp.ones((1, S, 32))
    ref = jnp.broadcast_to(jnp.asarray(get_reference_points([(5, 1)])), (1, 5, 2, 2))
    outs = {}
    for impl in ("gather", "pallas"):
        mod = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2, impl=impl)
        params = mod.init(jax.random.PRNGKey(0), q, ref, feat, shapes)
        outs[impl] = np.asarray(mod.apply(params, q, ref, feat, shapes))
    np.testing.assert_allclose(outs["gather"], outs["pallas"], rtol=1e-5, atol=1e-5)


def test_pallas_supports_wide_levels():
    """The flat-dense layout has no per-level width constraint: wide levels
    (W > 128) must be supported and exact."""
    assert mp.supported([(4, 128)]) and mp.supported([(3, 200)])
    rng = np.random.default_rng(2)
    H, W = 3, 200
    B, M, D, P, Lq = 1, 1, 8, 2, 7
    v = jnp.asarray(rng.standard_normal((B, H * W, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, 1, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, 1, P)), jnp.float32)
    a = ms_deform_attn_core(v, [(H, W)], loc, aw)
    b = mp.msda_pallas(v, loc, aw, ((H, W),))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_pallas_locality_skipping_is_exact():
    """Clustered sampling (the real model's regime: reference points + small
    offsets) must produce identical results to scattered sampling paths."""
    rng = np.random.default_rng(1)
    H = W = 16
    B, M, D, P, Lq = 1, 2, 8, 4, 24
    v = jnp.asarray(rng.standard_normal((B, H * W, M, D)), jnp.float32)
    # all queries sample inside a 3x3-pixel neighbourhood of one corner
    base = np.array([0.1, 0.85])
    loc = jnp.asarray(base + rng.uniform(-0.05, 0.05, (B, Lq, M, 1, P, 2)),
                      jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, 1, P)), jnp.float32)
    a = ms_deform_attn_core(v, [(H, W)], loc, aw)
    b = mp.msda_pallas(v, loc, aw, ((H, W),))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda v_: ms_deform_attn_core(v_, [(H, W)], loc, aw).sum())(v)
    g2 = jax.grad(lambda v_: mp.msda_pallas(v_, loc, aw, ((H, W),)).sum())(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)
