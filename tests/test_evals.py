"""Eval harnesses: metrics vs sklearn-free oracles, knn (incl. sharded), linear
probe grid learning, logreg sweep."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptersis_tpu.evals import (
    LinearProbeGrid,
    ModelWithIntermediateLayers,
    knn_classify,
    logreg_sweep,
    real_accuracy,
    topk_accuracy,
)
from adaptersis_tpu.evals.knn import eval_knn
from adaptersis_tpu.parallel.mesh import get_mesh


def blobs(n, d, c, seed=0, spread=4.0, centers_seed=42):
    rng = np.random.default_rng(seed)
    centers = np.random.default_rng(centers_seed).standard_normal((c, d)) * spread
    y = rng.integers(0, c, n)
    x = centers[y] + rng.standard_normal((n, d))
    return x.astype(np.float32), y.astype(np.int32)


def test_topk_accuracy():
    logits = jnp.asarray([[3.0, 2.0, 1.0], [0.0, 1.0, 2.0]])
    y = jnp.asarray([0, 0])
    assert float(topk_accuracy(logits, y, k=1)) == 0.5
    assert float(topk_accuracy(logits, y, k=3)) == 1.0
    macro = topk_accuracy(logits, y, k=1, average="macro")
    assert float(macro) == 0.5


def test_real_accuracy():
    logits = jnp.asarray([[3.0, 2.0], [0.0, 1.0]])
    targets = jnp.asarray([[1, 1], [1, 0]])
    assert float(real_accuracy(logits, targets)) == 0.5


def test_knn_dense_vs_sharded():
    x, y = blobs(256, 16, 4)
    xt, yt = blobs(40, 16, 4, seed=1)
    dense = knn_classify(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt), 4, k=10)
    mesh = get_mesh(devices=jax.devices()[:8], fsdp=1)
    shard = knn_classify(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt), 4, k=10, mesh=mesh)
    # same top-k neighbors → same scores
    np.testing.assert_allclose(np.asarray(dense), np.asarray(shard), rtol=1e-4, atol=1e-5)
    accs = eval_knn(x, y, xt, yt, num_classes=4, nb_knn=(5, 10))
    assert accs[5] > 0.8


def test_linear_probe_grid_learns():
    E, n_blocks, C = 16, 2, 3
    x, y = blobs(512, E, C, spread=5.0)
    # fake taps: two blocks of (patch tokens, cls token); cls carries the signal
    taps = tuple((jnp.tile(jnp.asarray(x)[:, None, :], (1, 4, 1)), jnp.asarray(x))
                 for _ in range(n_blocks))
    grid = LinearProbeGrid(embed_dim=E, n_last_blocks=n_blocks, num_classes=C,
                           lrs=(0.1, 0.01))
    grid.init(jax.random.PRNGKey(0))
    assert len(grid.heads) == 2 * 2 * 2  # n_blocks × avgpool × lrs
    for _ in range(30):
        grid.train_step(taps, jnp.asarray(y))
    best, accs = grid.evaluate([taps], [y])
    assert accs[best] > 0.9, accs


def test_logreg_sweep():
    x, y = blobs(256, 8, 3, spread=6.0)
    xv, yv = blobs(64, 8, 3, seed=2, spread=6.0)
    best, accs = logreg_sweep(x, y, xv, yv, num_classes=3, Cs=(0.01, 1.0), max_iter=50)
    assert accs[best] > 0.85, accs


def test_model_with_intermediate_layers():
    from adaptersis_tpu.models.vit import DinoVisionTransformer

    bb = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=32, depth=3, num_heads=2)
    x = jnp.zeros((2, 56, 56, 3))
    variables = bb.init(jax.random.PRNGKey(0), x)
    m = ModelWithIntermediateLayers(bb, variables, n_last_blocks=2)
    taps = m(x)
    assert len(taps) == 2
    patch, cls = taps[0]
    assert patch.shape == (2, 16, 32) and cls.shape == (2, 32)
