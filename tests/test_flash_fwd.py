"""ops/flash_fwd.py — forward-only flash kernel vs plain softmax attention.

Interpret-mode numerics (the on-chip A/B lives in tools/bench_flash.py).
Covers: flagship geometry (1765→1792 pad) with key-padding masking, f32 tight
bound, bf16 loose bound, a non-multiple-of-896 length (BQ fallback), and the
layers.py dispatch (attn_impl="flash_fwd" == "flash" output on valid rows).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import adaptersis_tpu.ops.flash_fwd as ff


@pytest.fixture(autouse=True)
def _interpret():
    ff._FORCE_INTERPRET = True
    yield
    ff._FORCE_INTERPRET = None


def _ref_sdpa(q, k, v, valid, scale):
    """f64 reference softmax attention with key-padding mask."""
    q, k, v = (np.asarray(t, np.float64) for t in (q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", q * scale, k)
    s = np.where(np.asarray(valid)[:, None, None, :] > 0, s, -np.inf)
    s -= s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def _case(B, H, N, Np, Dh, dtype, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, Np, Dh)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, Np, Dh)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, Np, Dh)), dtype)
    valid = jnp.broadcast_to((jnp.arange(Np) < N).astype(jnp.int32)[None],
                             (B, Np))
    return q, k, v, valid


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6), (jnp.bfloat16, 2e-2)])
def test_masked_padded(dtype, tol):
    B, H, N, Np, Dh = 2, 3, 117, 256, 64
    q, k, v, valid = _case(B, H, N, Np, Dh, dtype)
    out = ff.flash_fwd(q, k, v, valid, 0.125)
    ref = _ref_sdpa(q, k, v, valid, 0.125)
    err = np.abs(np.asarray(out, np.float64)[:, :, :N] - ref[:, :, :N]).max()
    assert err < tol, err


def test_prewidened_v_matches_plain():
    """v arriving with the ones column already appended (fused_ln_qkv
    v_ones=True) must produce the identical output — fwd and grads."""
    B, H, N, Np, Dh = 2, 2, 117, 256, 64
    q, k, v, valid = _case(B, H, N, Np, Dh, jnp.float32)
    vp = jnp.concatenate([v, jnp.ones((B, H, Np, 1), v.dtype)], axis=-1)
    out0 = ff.flash_fwd(q, k, v, valid, 0.125)
    out1 = ff.flash_fwd(q, k, vp, valid, 0.125)
    assert float(jnp.abs(out0 - out1).max()) == 0.0

    def loss(vv):
        o = ff.flash_fwd(q, k, vv, valid, 0.125)
        return ((o[:, :, :N] + 1.0) ** 2).sum()

    g0 = jax.grad(loss)(v)
    g1 = jax.grad(loss)(vp)
    assert g1.shape == vp.shape
    assert float(jnp.abs(g1[..., :-1] - g0).max()) < 1e-5


def test_flagship_shape_f32():
    # 1792 picks BQ=896; small B/H keep interpret mode fast
    B, H, N, Np, Dh = 1, 2, 1765, 1792, 64
    q, k, v, valid = _case(B, H, N, Np, Dh, jnp.float32)
    out = ff.flash_fwd(q, k, v, valid, 0.125)
    ref = _ref_sdpa(q, k, v, valid, 0.125)
    err = np.abs(np.asarray(out, np.float64)[:, :, :N] - ref[:, :, :N]).max()
    assert err < 2e-6, err


def test_no_mask_all_valid():
    B, H, N, Dh = 2, 2, 384, 64
    q, k, v, valid = _case(B, H, N, N, Dh, jnp.float32)
    out = ff.flash_fwd(q, k, v, valid, 0.25)
    ref = _ref_sdpa(q, k, v, valid, 0.25)
    assert np.abs(np.asarray(out, np.float64) - ref).max() < 2e-6


def test_layers_dispatch_matches_flash():
    """Attention(attn_impl='flash_fwd') == attn_impl='flash' on valid rows."""
    from adaptersis_tpu.models import layers as L

    B, N, H, Dh = 2, 117, 4, 16
    C = H * Dh
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    outs = {}
    for impl in ("einsum", "flash_fwd"):
        attn = L.Attention(num_heads=H, attn_impl=impl, dtype=jnp.float32)
        params = attn.init(jax.random.PRNGKey(0), x)
        outs[impl] = np.asarray(attn.apply(params, x))
    assert np.abs(outs["einsum"] - outs["flash_fwd"]).max() < 1e-5


def test_library_flash_block_sizes_have_backward_blocks():
    """Differentiating the library flash kernel requires every backward tile
    to be set (BlockSizes.has_backward_blocks) — the SSL student path trains
    THROUGH attention and failed with partial BlockSizes (round 5)."""
    from adaptersis_tpu.models.layers import _flash_block_sizes

    for np_len in (128, 256, 512, 640, 896, 1024, 1792, 2048):
        bs = _flash_block_sizes(np_len)
        assert bs.has_backward_blocks
        for b in (bs.block_q, bs.block_k, bs.block_q_dq, bs.block_k_dq,
                  bs.block_q_dkv, bs.block_k_dkv):
            assert np_len % b == 0


def test_flash_dqk_override_keeps_minor_dividing_major():
    """ASN_FLASH_DQK must never yield block_k_dq that doesn't divide
    block_k_major_dq — the library dq kernel iterates major//minor inner
    tiles and would silently drop kv positions from the gradient."""
    import os

    from adaptersis_tpu.models.layers import _flash_block_sizes

    for override in ("896", "384", "128", "999"):
        os.environ["ASN_FLASH_DQK"] = override
        try:
            for np_len in (512, 1792, 1024):
                bs = _flash_block_sizes(np_len)
                assert bs.block_k_major_dq % bs.block_k_dq == 0
                assert np_len % bs.block_k_major_dq == 0
        finally:
            del os.environ["ASN_FLASH_DQK"]
