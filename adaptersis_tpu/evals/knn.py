"""k-NN classification (reference: dinov2/eval/knn.py:99-184).

The reference shards train features per rank and runs broadcast+gather rounds of
partial top-k over NCCL (:129-160). TPU-native: train features are sharded over
the mesh's data axis; a shard_map computes each shard's local top-k similarities,
then a single all_gather + global top-k — one XLA program, collectives on ICI
(SURVEY §2.10 'collective permute for the k-NN rounds').

Vote: softmax(similarity / T) weighted class vote (:170-184).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def knn_classify(
    train_features: jax.Array,   # (N, D) — L2-normalized or raw
    train_labels: jax.Array,     # (N,)
    test_features: jax.Array,    # (M, D)
    num_classes: int,
    k: int = 10,
    T: float = 0.07,
    mesh: Optional[Mesh] = None,
    normalize: bool = True,
) -> jax.Array:
    """Returns (M, num_classes) class scores."""
    if normalize:
        train_features = train_features / jnp.linalg.norm(train_features, axis=-1, keepdims=True)
        test_features = test_features / jnp.linalg.norm(test_features, axis=-1, keepdims=True)

    def scores_fn(train_f, train_y, test_f):
        sim = test_f @ train_f.T                        # (M, N)
        topv, topi = jax.lax.top_k(sim, k)
        topy = train_y[topi]                            # (M, k)
        w = jnp.exp(topv / T)
        onehot = jax.nn.one_hot(topy, num_classes)
        return jnp.einsum("mk,mkc->mc", w, onehot)

    if mesh is None:
        return scores_fn(train_features, train_labels, test_features)

    n_shards = mesh.shape["data"]
    N = train_features.shape[0]
    pad = (-N) % n_shards
    if pad:
        train_features = jnp.pad(train_features, ((0, pad), (0, 0)))
        # padded rows get label 0 but -inf similarity via a validity mask
        train_labels = jnp.pad(train_labels, (0, pad))
    valid = jnp.arange(train_features.shape[0]) < N

    def sharded(train_f, train_y, valid_s, test_f):
        sim = test_f @ train_f.T
        sim = jnp.where(valid_s[None, :], sim, -jnp.inf)
        topv, topi = jax.lax.top_k(sim, k)              # local top-k per shard
        topy = train_y[topi]
        # gather all shards' candidates, re-select global top-k
        allv = jax.lax.all_gather(topv, "data", axis=1, tiled=True)   # (M, k*S)
        ally = jax.lax.all_gather(topy, "data", axis=1, tiled=True)
        gv, gi = jax.lax.top_k(allv, k)
        gy = jnp.take_along_axis(ally, gi, axis=1)
        w = jnp.exp(gv / T)
        return jnp.einsum("mk,mkc->mc", w, jax.nn.one_hot(gy, num_classes))

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data"), P(None, None)),
        out_specs=P(None, None),
        check_rep=False,
    )
    return jax.jit(fn)(train_features, train_labels, valid, test_features)


def eval_knn(train_features, train_labels, test_features, test_labels,
             num_classes: int, nb_knn: Sequence[int] = (10, 20, 100, 200),
             T: float = 0.07, mesh=None):
    """Accuracy for each k (reference eval_knn sweep)."""
    out = {}
    for k in nb_knn:
        scores = knn_classify(jnp.asarray(train_features), jnp.asarray(train_labels),
                              jnp.asarray(test_features), num_classes, k=k, T=T, mesh=mesh)
        acc = float((jnp.argmax(scores, -1) == jnp.asarray(test_labels)).mean())
        out[k] = acc
    return out
