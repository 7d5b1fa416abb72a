"""Fused Pallas LayerNorm (ops/layernorm.py) vs flax nn.LayerNorm.

Reference behavior: torch nn.LayerNorm(eps=1e-6) over the last axis
(/root/reference/dinov2/layers/block.py:58) — flax nn.LayerNorm with
use_fast_variance (its default) is the existing golden-tested equivalent, so
the kernel is checked against that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from adaptersis_tpu.ops import layernorm
from adaptersis_tpu.models.layers import FusedLayerNorm


@pytest.fixture(autouse=True)
def _interpret():
    layernorm._FORCE_INTERPRET = True
    yield
    layernorm._FORCE_INTERPRET = None


def _ref_ln(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    return (xf - mean) * jax.lax.rsqrt(var + eps) * w + b


@pytest.mark.parametrize("shape", [(4, 7, 256), (2, 1765, 128), (128, 384)])
def test_fused_ln_matches_reference_fp32(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 3 + 1.5
    w = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    b = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    got = layernorm.fused_layernorm(x, w, b, 1e-6)
    want = _ref_ln(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_ln_bf16_matches_fp32_reference():
    rng = np.random.default_rng(1)
    x32 = rng.normal(size=(3, 130, 256)).astype(np.float32)
    w = jnp.asarray(rng.normal(size=256).astype(np.float32))
    b = jnp.asarray(rng.normal(size=256).astype(np.float32))
    got = layernorm.fused_layernorm(jnp.asarray(x32, jnp.bfloat16), w, b, 1e-6)
    assert got.dtype == jnp.bfloat16
    want = _ref_ln(jnp.asarray(x32, jnp.bfloat16), w, b)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2, rtol=3e-2)


def test_fused_ln_grads_match_plain():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 37, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=256).astype(np.float32)) + 1.0
    b = jnp.asarray(rng.normal(size=256).astype(np.float32))

    def f_fused(x, w, b):
        return jnp.sum(jnp.sin(layernorm.fused_layernorm(x, w, b, 1e-6)))

    def f_plain(x, w, b):
        return jnp.sum(jnp.sin(_ref_ln(x, w, b)))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(f_plain, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)


def test_module_matches_nn_layernorm_and_param_tree():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 50, 256)).astype(np.float32))
    ours = FusedLayerNorm(epsilon=1e-6, dtype=jnp.float32)
    ref = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32)
    p1 = ours.init(jax.random.PRNGKey(0), x)
    p2 = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    # random affine so the test is not trivially identity
    p = jax.tree_util.tree_map(
        lambda t: jnp.asarray(rng.normal(size=t.shape).astype(np.float32)), p1)
    np.testing.assert_allclose(np.asarray(ours.apply(p, x)),
                               np.asarray(ref.apply(p, x)), atol=1e-5, rtol=1e-5)


def test_module_fallback_odd_feature_dim():
    # C not a lane multiple → plain-XLA path inside the module
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 9, 12)).astype(np.float32))
    ours = FusedLayerNorm(epsilon=1e-6, dtype=jnp.float32)
    ref = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32)
    p = ours.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(ours.apply(p, x)),
                               np.asarray(ref.apply(p, x)), atol=1e-5, rtol=1e-5)


def test_backbone_ln_impl_pallas_matches_xla():
    from adaptersis_tpu.models import build_backbone

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(1, 56, 56, 3)).astype(np.float32))
    kw = dict(img_size=56, patch_size=14)
    m1 = build_backbone("vit_small", **kw)
    m2 = build_backbone("vit_small", ln_impl="pallas", **kw)
    p = m1.init(jax.random.PRNGKey(0), x)
    o1 = m1.apply(p, x)
    o2 = m2.apply(p, x)  # identical param tree by construction
    np.testing.assert_allclose(np.asarray(o1["x_norm_patchtokens"]),
                               np.asarray(o2["x_norm_patchtokens"]),
                               atol=2e-5, rtol=2e-5)
