"""Fused LN→MLP→LayerScale→residual kernel (ops/fused_mlp.py) parity.

Reference semantics: dinov2/layers/block.py:84-91 MLP residual half with
LayerScale; verified against both the plain-jnp formula and the unfused
Block path (identical param trees by construction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import adaptersis_tpu.ops.fused_mlp as fm
from adaptersis_tpu.models.layers import Block

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _interp():
    fm._FORCE_INTERPRET = True
    yield
    fm._FORCE_INTERPRET = None


def _inputs(R=150, C=256, H=1024, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, R, C)), dtype)
    ls = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
    lb = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, H)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(H) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, C)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)
    g = jnp.full((C,), 1e-1, jnp.float32)
    return x, ls, lb, w1, b1, w2, b2, g


def test_fused_matches_reference_f32():
    args = _inputs()
    out = fm.fused_ln_mlp(*args)
    ref = fm.reference_ln_mlp(*args)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_fused_matches_reference_bf16():
    args = _inputs(dtype=jnp.bfloat16)
    out = fm.fused_ln_mlp(*args).astype(jnp.float32)
    ref = fm.reference_ln_mlp(*args).astype(jnp.float32)
    assert float(jnp.abs(out - ref).max()) < 5e-2


def test_fused_row_padding():
    # R=37 rows: tile-pad path (rows are garbage in-pad, must be sliced off)
    args = _inputs(R=37)
    out = fm.fused_ln_mlp(*args)
    ref = fm.reference_ln_mlp(*args)
    assert out.shape == args[0].shape
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_fused_grads_match_reference():
    args = _inputs()
    g1 = jax.grad(lambda *a: (fm.fused_ln_mlp(*a) ** 2).sum(),
                  argnums=(0, 1, 3, 4, 5, 6, 7))(*args)
    g2 = jax.grad(lambda *a: (fm.reference_ln_mlp(*a) ** 2).sum(),
                  argnums=(0, 1, 3, 4, 5, 6, 7))(*args)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) < 1e-4


def test_block_fused_path_matches_xla_path():
    # identical param trees -> the same variables drive both impls
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 50, 256)), jnp.float32)
    blk_x = Block(256, 4, gelu_approx=True, mlp_impl="xla")
    blk_p = Block(256, 4, gelu_approx=True, mlp_impl="pallas")
    v = blk_x.init(jax.random.PRNGKey(0), x)
    v2 = blk_p.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)))
    o1 = blk_x.apply(v, x)
    o2 = blk_p.apply(v, x)
    assert float(jnp.abs(o1 - o2).max()) < 1e-5


def test_block_fused_requires_layerscale_and_tanh():
    # fused path silently falls back when preconditions fail -> still correct
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 20, 128)), jnp.float32)
    for kw in ({"init_values": None}, {"gelu_approx": False}):
        blk_p = Block(128, 4, mlp_impl="pallas",
                      **{"gelu_approx": True, **kw})
        blk_x = Block(128, 4, mlp_impl="xla",
                      **{"gelu_approx": True, **kw})
        v = blk_x.init(jax.random.PRNGKey(0), x)
        assert float(jnp.abs(blk_p.apply(v, x) - blk_x.apply(v, x)).max()) == 0.0
