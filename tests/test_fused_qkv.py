"""Fused LN+QKV+head-split kernel (ops/fused_qkv.py) parity.

Reference semantics: dinov2/layers/attention.py:36-55 (qkv Linear + head
split) with block.py:58 pre-norm. The flash call itself is TPU-only, so the
block-level check emulates attention with the einsum SDPA on the kernel's
q/k/v and compares against the unfused Block."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import adaptersis_tpu.ops.fused_qkv as fq
from adaptersis_tpu.models.layers import Block

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _interp():
    fq._FORCE_INTERPRET = True
    yield
    fq._FORCE_INTERPRET = None


def _inputs(R=150, C=256, H=4, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, R, C)), dtype)
    ls = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
    lb = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.standard_normal(3 * C) * 0.01, jnp.float32)
    return x, ls, lb, w, b, H


def test_fused_qkv_matches_reference_f32():
    *args, H = _inputs()
    o = fq.fused_ln_qkv(*args, H)
    r = fq.reference_ln_qkv(*args, H)
    for a, b in zip(o, r):
        assert a.shape == b.shape
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_fused_qkv_matches_reference_bf16():
    *args, H = _inputs(dtype=jnp.bfloat16)
    o = fq.fused_ln_qkv(*args, H)
    r = fq.reference_ln_qkv(*args, H)
    for a, b in zip(o, r):
        assert float(jnp.abs(a.astype(jnp.float32)
                             - b.astype(jnp.float32)).max()) < 5e-2


def test_fused_qkv_row_padding():
    *args, H = _inputs(R=37)
    o = fq.fused_ln_qkv(*args, H)
    r = fq.reference_ln_qkv(*args, H)
    for a, b in zip(o, r):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_fused_qkv_v_ones_column():
    """v_ones=True emits v widened to Dh+1 with the flash_fwd denominator
    ones column baked in; q/k and v[..., :-1] are unchanged."""
    *args, H = _inputs()
    q0, k0, v0 = fq.fused_ln_qkv(*args, H)
    q1, k1, v1 = fq.fused_ln_qkv(*args, H, 1e-6, True)
    assert v1.shape == v0.shape[:-1] + (v0.shape[-1] + 1,)
    assert float(jnp.abs(q1 - q0).max()) == 0.0
    assert float(jnp.abs(k1 - k0).max()) == 0.0
    assert float(jnp.abs(v1[..., :-1] - v0).max()) == 0.0
    assert float(jnp.abs(v1[..., -1] - 1.0).max()) == 0.0


def test_fused_qkv_v_ones_grads_match_plain():
    """Gradients through the widened-v path equal the plain path (the ones
    column is constant, so its cotangent must not leak into the inputs)."""
    *args, H = _inputs()

    def loss(widen, *a):
        q, k, v = fq.fused_ln_qkv(*a, H, 1e-6, widen)
        if widen:
            v = v[..., :-1]
        return (q ** 2).sum() + (k ** 2).sum() + (v ** 2).sum()

    g0 = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 3, 4))(*args)
    g1 = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 3, 4))(*args)
    for a, b in zip(g0, g1):
        assert float(jnp.abs(a - b).max()) < 1e-6


def test_fused_qkv_grads_match_reference():
    *args, H = _inputs()
    g1 = jax.grad(lambda *a: sum((t ** 2).sum()
                                 for t in fq.fused_ln_qkv(*a, H)),
                  argnums=(0, 1, 3, 4))(*args)
    g2 = jax.grad(lambda *a: sum((t ** 2).sum()
                                 for t in fq.reference_ln_qkv(*a, H)),
                  argnums=(0, 1, 3, 4))(*args)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) < 1e-4


def test_block_fused_qkv_wiring_matches_xla_block():
    """Emulate the Block's fused-attn branch with einsum attention on the
    kernel's q/k/v and assert it matches the unfused Block's attn half —
    validates the param mapping and the (h, d)-contracting projection."""
    rng = np.random.default_rng(1)
    C, H = 256, 4
    x = jnp.asarray(rng.standard_normal((2, 50, C)), jnp.float32)
    blk = Block(C, H, gelu_approx=True, attn_impl="einsum")
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x)

    p = v["params"]
    q, k, vv = fq.fused_ln_qkv(
        x, p["norm1"]["scale"], p["norm1"]["bias"],
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"], H)
    scale = 1.0 / math.sqrt(C // H)
    attn = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q * scale, k), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vv)
    h = jnp.einsum("bhnd,hdc->bnc", out,
                   p["attn"]["proj"]["kernel"].reshape(H, C // H, C))
    h = h + p["attn"]["proj"]["bias"]
    got = x + p["ls1"]["gamma"] * h
    # compare the attention half only: rebuild ref's attn half the same way
    import flax.linen as nn
    xn = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": p["norm1"]["scale"], "bias": p["norm1"]["bias"]}}, x)
    qkv = xn @ p["attn"]["qkv"]["kernel"] + p["attn"]["qkv"]["bias"]
    qkv = qkv.reshape(2, 50, 3, H, C // H)
    q2, k2, v2 = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn2 = jax.nn.softmax(
        jnp.einsum("bqhd,bkhd->bhqk", q2 * scale, k2), axis=-1)
    out2 = jnp.einsum("bhqk,bkhd->bqhd", attn2, v2).reshape(2, 50, C)
    ref_half = x + p["ls1"]["gamma"] * (
        out2 @ p["attn"]["proj"]["kernel"] + p["attn"]["proj"]["bias"])
    assert float(jnp.abs(got - ref_half).max()) < 1e-4
    assert ref.shape == got.shape


def test_block_fused_qkv_param_tree_identical():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 20, 128)), jnp.float32)
    blk_x = Block(128, 4, gelu_approx=True, attn_impl="flash", qkv_impl="xla")
    blk_p = Block(128, 4, gelu_approx=True, attn_impl="flash",
                  qkv_impl="pallas")
    # init must not execute flash on CPU — init with einsum twin instead for
    # the xla tree, and rely on the pallas branch not reaching flash at init?
    # flash IS reached at init; so compare trees via the einsum variant for
    # the unfused side and a lazy init for the fused side.
    blk_e = Block(128, 4, gelu_approx=True, attn_impl="einsum")
    v_x = blk_e.init(jax.random.PRNGKey(0), x)
    try:
        v_p = jax.eval_shape(
            lambda r, t: blk_p.init(r, t), jax.random.PRNGKey(0), x)
    except Exception:
        pytest.skip("flash unavailable on CPU even for eval_shape")
    flat_x = {"/".join(map(str, k)): tuple(l.shape) for k, l in
              jax.tree_util.tree_flatten_with_path(v_x["params"])[0]}
    flat_p = {"/".join(map(str, k)): tuple(l.shape) for k, l in
              jax.tree_util.tree_flatten_with_path(v_p["params"])[0]}
    assert flat_x == flat_p
