"""k-NN classification (reference: dinov2/eval/knn.py:99-184).

The reference shards train features per rank and round-robins broadcast+gather
of test CHUNKS precisely so no rank ever holds the full (M, N) similarity
matrix (:129-160: chunked test broadcast, per-rank partial top-k, gather +
second top-k on the target rank). TPU-native equivalent with the same bounded
footprint: train features are sharded over the mesh's data axis; a shard_map
scans over fixed-size test chunks — each iteration computes the (chunk, N/S)
local similarities, reduces to the local top-k, all-gathers only the (chunk,
k·S) candidates and re-selects the global top-k — one XLA program, collectives
on ICI. Per-device live memory is O(chunk · N/S), independent of M, and the
similarity matrix never materializes beyond one chunk.

Vote: softmax(similarity / T) weighted class vote (:170-184).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _vote(topv: jax.Array, topy: jax.Array, num_classes: int, T: float) -> jax.Array:
    w = jnp.exp(topv / T)
    onehot = jax.nn.one_hot(topy, num_classes)
    return jnp.einsum("mk,mkc->mc", w, onehot)


def knn_classify(
    train_features: jax.Array,   # (N, D) — L2-normalized or raw
    train_labels: jax.Array,     # (N,)
    test_features: jax.Array,    # (M, D)
    num_classes: int,
    k: int = 10,
    T: float = 0.07,
    mesh: Optional[Mesh] = None,
    normalize: bool = True,
    test_chunk: int = 1024,
) -> jax.Array:
    """Returns (M, num_classes) class scores.

    `test_chunk` bounds the live similarity slab to (test_chunk, N/shards) per
    device — the memory-bounded protocol of the reference (knn.py:129-160)."""
    if normalize:
        train_features = train_features / jnp.linalg.norm(train_features, axis=-1, keepdims=True)
        test_features = test_features / jnp.linalg.norm(test_features, axis=-1, keepdims=True)

    M = test_features.shape[0]
    cm = min(test_chunk, M)
    pad_m = (-M) % cm
    if pad_m:
        test_features = jnp.pad(test_features, ((0, pad_m), (0, 0)))
    n_chunks = test_features.shape[0] // cm
    test_chunks = test_features.reshape(n_chunks, cm, test_features.shape[1])

    if mesh is None:
        def chunk_fn(test_c):
            sim = test_c @ train_features.T              # (cm, N)
            topv, topi = jax.lax.top_k(sim, k)
            return _vote(topv, train_labels[topi], num_classes, T)

        scores = jax.lax.map(chunk_fn, test_chunks)
        return scores.reshape(-1, num_classes)[:M]

    n_shards = mesh.shape["data"]
    N = train_features.shape[0]
    pad = (-N) % n_shards
    if pad:
        train_features = jnp.pad(train_features, ((0, pad), (0, 0)))
        # padded rows get label 0 but -inf similarity via a validity mask
        train_labels = jnp.pad(train_labels, (0, pad))
    valid = jnp.arange(train_features.shape[0]) < N

    def sharded(train_f, train_y, valid_s, test_cs):
        def chunk_fn(test_c):
            sim = test_c @ train_f.T                     # (cm, N/S) — the bound
            sim = jnp.where(valid_s[None, :], sim, -jnp.inf)
            topv, topi = jax.lax.top_k(sim, k)           # local top-k per shard
            topy = train_y[topi]
            # gather all shards' candidates (cm, k·S), re-select global top-k
            allv = jax.lax.all_gather(topv, "data", axis=1, tiled=True)
            ally = jax.lax.all_gather(topy, "data", axis=1, tiled=True)
            gv, gi = jax.lax.top_k(allv, k)
            gy = jnp.take_along_axis(ally, gi, axis=1)
            return _vote(gv, gy, num_classes, T)

        return jax.lax.map(chunk_fn, test_cs)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data"), P(None, None, None)),
        out_specs=P(None, None, None),
        check_rep=False,
    )
    scores = jax.jit(fn)(train_features, train_labels, valid, test_chunks)
    return scores.reshape(-1, num_classes)[:M]


def eval_knn(train_features, train_labels, test_features, test_labels,
             num_classes: int, nb_knn: Sequence[int] = (10, 20, 100, 200),
             T: float = 0.07, mesh=None, test_chunk: int = 1024):
    """Accuracy for each k (reference eval_knn sweep)."""
    out = {}
    for k in nb_knn:
        scores = knn_classify(jnp.asarray(train_features), jnp.asarray(train_labels),
                              jnp.asarray(test_features), num_classes, k=k, T=T,
                              mesh=mesh, test_chunk=test_chunk)
        acc = float((jnp.argmax(scores, -1) == jnp.asarray(test_labels)).mean())
        out[k] = acc
    return out
