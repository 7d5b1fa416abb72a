"""ViTAdapter + Mask2Former stack: shapes, matching, point sampling, inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.mask2former import (
    Mask2FormerHead,
    hungarian_match,
    mask2former_semantic_inference,
    point_sample,
    sine_positional_encoding,
    uncertainty_sample_points,
)
from adaptersis_tpu.models.vit_adapter import ViTAdapter
from adaptersis_tpu.models.vit import DinoVisionTransformer


def test_vit_adapter_pyramid():
    bb = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=64, depth=4,
                               num_heads=4)
    m = ViTAdapter(backbone=bb, deform_num_heads=8)
    x = jnp.zeros((1, 112, 112, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    f1, f2, f3, f4 = m.apply(v, x, train=False)
    assert f1.shape[1] > f2.shape[1] > f3.shape[1] > f4.shape[1]
    assert all(f.shape[-1] == 64 for f in (f1, f2, f3, f4))
    # level_embed is a REAL parameter here (vs the train.py zeros bug)
    assert "level_embed" in v["params"]
    assert float(jnp.abs(v["params"]["level_embed"]).sum()) > 0


def test_mask2former_head_shapes():
    rng = np.random.default_rng(0)
    B, C = 1, 32
    feats = [jnp.asarray(rng.standard_normal((B, s, s, C)), jnp.float32)
             for s in (16, 8, 4, 2)]
    head = Mask2FormerHead(num_classes=5, num_queries=10, feat_channels=C,
                           num_decoder_layers=3)
    v = head.init(jax.random.PRNGKey(0), feats, train=False)
    cls_all, mask_all = head.apply(v, feats, train=False)
    assert len(cls_all) == 4  # initial + 3 layers
    assert cls_all[-1].shape == (B, 10, 6)
    assert mask_all[-1].shape == (B, 10, 16, 16)
    seg = mask2former_semantic_inference(cls_all[-1], mask_all[-1], (32, 32))
    assert seg.shape == (B, 32, 32, 5)


def test_hungarian_match():
    cost = jnp.asarray([[[1.0, 10.0], [10.0, 1.0]],
                        [[10.0, 1.0], [1.0, 10.0]]])
    out = np.asarray(hungarian_match(cost))
    # batch 0: q0→t0, q1→t1; batch 1: q0→t1, q1→t0
    assignment0 = dict(zip(out[0, 0], out[0, 1]))
    assignment1 = dict(zip(out[1, 0], out[1, 1]))
    assert assignment0 == {0: 0, 1: 1}
    assert assignment1 == {0: 1, 1: 0}


def test_point_sample_and_uncertainty():
    mask = jnp.zeros((1, 8, 8)).at[:, :, 4:].set(1.0)
    pts = jnp.asarray([[[0.1, 0.5], [0.9, 0.5]]])  # (x, y)
    vals = np.asarray(point_sample(mask, pts))
    assert vals[0, 0] < 0.5 and vals[0, 1] > 0.5
    logits = jnp.zeros((2, 8, 8)).at[:, :, 4:].set(5.0).at[:, :, :4].set(-5.0)
    p = uncertainty_sample_points(logits, 16, jax.random.PRNGKey(0))
    assert p.shape == (2, 16, 2)
    assert (np.asarray(p) >= 0).all() and (np.asarray(p) <= 1).all()


def test_sine_positional_encoding():
    pe = sine_positional_encoding((4, 6), num_feats=8)
    assert pe.shape == (4, 6, 16)
    assert np.isfinite(np.asarray(pe)).all()


def test_device_lapjv_matches_scipy():
    """The on-device Jonker-Volgenant matcher must reach scipy's optimal total
    cost (pair sets may differ only on exact ties) and produce one-to-one
    assignments — on random costs and on the 1e6-padded-column form the m2f
    loss feeds it. All trials of a shape ride ONE batched execution: repeated
    same-shape executions of this program tickle an XLA:CPU dispatch bug on
    this image ("supplied 1 buffers but expected 2") once a large compiled
    train program has run in the same process; single executions are immune
    (on TPU the solver runs inline inside the jitted train step, a different
    path entirely)."""
    from scipy.optimize import linear_sum_assignment

    from adaptersis_tpu.ops.hungarian import lapjv

    rng = np.random.default_rng(7)
    for (B, Q, G) in [(4, 100, 2), (2, 100, 16), (3, 20, 20), (1, 7, 3)]:
        costs = []
        for trial in range(5):
            cost = rng.standard_normal((B, Q, G)).astype(np.float32) * 10
            if trial % 2 == 0:
                cost[:, :, max(G // 2, 1):] = 1e6   # padded gt columns
            costs.append(cost)
        stacked = np.concatenate(costs, axis=0)     # one call per shape
        out = np.asarray(lapjv(jnp.asarray(stacked)))
        for b in range(stacked.shape[0]):
            r, c = linear_sum_assignment(stacked[b].astype(np.float64))
            want = stacked[b].astype(np.float64)[r, c].sum()
            q, g = out[b, 0], out[b, 1]
            assert len(set(q.tolist())) == G
            assert (np.sort(g) == np.arange(G)).all()
            np.testing.assert_allclose(
                stacked[b].astype(np.float64)[q, g].sum(), want,
                rtol=1e-6, atol=1e-3)
