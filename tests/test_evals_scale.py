"""Scale-stress for the eval harnesses (VERDICT r2 #9): ≥10k-sample problems
where top-k padding, shard boundaries and L-BFGS convergence actually bite.

  * knn: 10,007 train samples (non-divisible by the 8-shard mesh) through the
    shard_map path — must match the dense path and beat a sanity accuracy bar.
  * logreg: 10k samples vs sklearn's LogisticRegression with the SAME
    objective convention (sum-CE + 0.5·||w||²/C) on a fixed seed.
  * linear grid: full 52-head grid at 10k samples in jitted steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptersis_tpu.evals import LinearProbeGrid, knn_classify, logreg_sweep
from adaptersis_tpu.parallel.mesh import get_mesh


def blobs(n, d, c, seed=0, spread=4.0, centers_seed=42):
    rng = np.random.default_rng(seed)
    centers = np.random.default_rng(centers_seed).standard_normal((c, d)) * spread
    y = rng.integers(0, c, n)
    x = centers[y] + rng.standard_normal((n, d))
    return x.astype(np.float32), y.astype(np.int32)


def test_knn_sharded_10k_nondivisible_matches_dense():
    N, D, C = 10_007, 64, 10  # 10007 is prime → never divides the 8-way mesh
    x, y = blobs(N, D, C, spread=3.0)
    xt, yt = blobs(512, D, C, seed=1, spread=3.0)
    dense = knn_classify(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt), C, k=200)
    mesh = get_mesh(devices=jax.devices()[:8], fsdp=1)
    shard = knn_classify(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt), C,
                         k=200, mesh=mesh)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(shard),
                               rtol=1e-4, atol=1e-4)
    acc = float((jnp.argmax(shard, -1) == jnp.asarray(yt)).mean())
    assert acc > 0.9, acc


def test_knn_100k_memory_bounded():
    """VERDICT r3 #6: the chunked protocol must keep per-device memory
    O(test_chunk · N/S) — the (M, N/S) similarity slab may never materialize
    for the full test set (reference knn.py:129-160 round-robin semantics)."""
    N, D, C, M = 100_003, 64, 10, 4096
    x, y = blobs(N, D, C, spread=3.0)
    xt, _ = blobs(M, D, C, seed=1, spread=3.0)
    mesh = get_mesh(devices=jax.devices()[:8], fsdp=1)
    chunk = 256
    shard = knn_classify(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt), C,
                         k=20, mesh=mesh, test_chunk=chunk)
    # spot-check correctness on a test slice against the dense path
    dense = knn_classify(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt[:256]),
                         C, k=20, test_chunk=256)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(shard)[:256],
                               rtol=1e-4, atol=1e-4)

    # assert the compiled memory bound: temp allocations must stay near the
    # chunked slab size, far below the full (M, N/S) similarity matrix
    from jax.experimental.shard_map import shard_map  # noqa: F401  (parity import)
    from adaptersis_tpu.evals import knn as knn_mod

    n_dev = 8
    shard_rows = -(-N // n_dev)
    full_slab = n_dev * M * shard_rows * 4            # unchunked footprint
    chunk_slab = n_dev * chunk * shard_rows * 4       # what chunking allows

    def fn(xf, yf, xtf):
        return knn_mod.knn_classify(xf, yf, xtf, C, k=20, mesh=mesh,
                                    test_chunk=chunk)

    lowered = jax.jit(fn).lower(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt))
    mem = lowered.compile().memory_analysis()
    if mem is not None and getattr(mem, "temp_size_in_bytes", 0):
        assert mem.temp_size_in_bytes < full_slab / 2, (
            mem.temp_size_in_bytes, full_slab, chunk_slab)


def test_logreg_10k_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.linear_model import LogisticRegression

    N, D, C = 10_000, 32, 5
    x, y = blobs(N, D, C, spread=1.5)          # overlapping blobs — nontrivial fit
    xv, yv = blobs(2_000, D, C, seed=3, spread=1.5)

    for C_reg in (0.1, 1.0):
        best, accs = logreg_sweep(x, y, xv, yv, num_classes=C,
                                  Cs=(C_reg,), max_iter=200)
        sk = LogisticRegression(C=C_reg, max_iter=500, tol=1e-6)
        sk.fit(x, y)
        sk_acc = sk.score(xv, yv)
        # same objective, both solved to convergence → same val accuracy
        assert abs(accs[C_reg] - sk_acc) < 0.01, (C_reg, accs[C_reg], sk_acc)


def test_linear_grid_full_52_heads_10k():
    E, n_blocks, C = 64, 4, 10
    N = 10_000
    x, y = blobs(N, E, C, spread=5.0)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    taps = tuple((jnp.tile(xj[:, None, :], (1, 2, 1)), xj) for _ in range(n_blocks))
    grid = LinearProbeGrid(embed_dim=E, n_last_blocks=n_blocks, num_classes=C)
    grid.init(jax.random.PRNGKey(0))
    assert len(grid.heads) == 52  # 2 block-counts × 2 avgpool × 13 lrs (ref grid)
    for _ in range(25):
        grid.train_step(taps, yj)
    best, accs = grid.evaluate([taps], [y])
    assert accs[best] > 0.95, (best, accs[best])
    # the grid must discriminate: some small-lr head should lag the best
    assert min(accs.values()) < accs[best] - 0.01 or accs[best] > 0.999
