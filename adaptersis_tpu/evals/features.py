"""Feature extraction (reference: dinov2/eval/utils.py).

  * ModelWithIntermediateLayers (:30-44) — wraps the backbone, returns
    get_intermediate_layers(x, n, return_class_token=True) under no-grad/autocast;
    here: a jitted closure with stop_gradient + bf16 compute.
  * extract_features (:98-146) — distributed feature extraction; the reference
    all_gathers per batch and index_copy_'s into a full-size tensor; under GSPMD
    the jit output is already globally addressable, so extraction is just a
    sharded forward + host transfer.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import shard_batch


class ModelWithIntermediateLayers:
    def __init__(self, backbone, variables, n_last_blocks: int = 4):
        self.backbone = backbone
        self.n = n_last_blocks

        def fwd(x):
            taps = backbone.apply(
                variables, x, n=n_last_blocks, return_class_token=True,
                method=backbone.get_intermediate_layers,
            )
            return jax.tree_util.tree_map(jax.lax.stop_gradient, taps)

        self._fwd = jax.jit(fwd)

    def __call__(self, x: jax.Array):
        return self._fwd(x)


def linear_probe_features(taps, use_n_blocks: int, use_avgpool: bool) -> jax.Array:
    """create_linear_input (dinov2/eval/linear.py): concat cls tokens of the last
    n blocks, optionally + mean-pooled patch tokens of the last block."""
    taps = taps[-use_n_blocks:]
    out = jnp.concatenate([cls for _, cls in taps], axis=-1)
    if use_avgpool:
        out = jnp.concatenate([out, jnp.mean(taps[-1][0], axis=1)], axis=-1)
        out = out.reshape(out.shape[0], -1)
    return out.astype(jnp.float32)


def extract_features(model: ModelWithIntermediateLayers, loader, mesh=None,
                     pool: str = "cls") -> Tuple[np.ndarray, np.ndarray]:
    """Run the frozen backbone over a loader, return (features, labels) on host."""
    feats, labels = [], []
    for imgs, ys, _ in loader:
        x = jnp.asarray(imgs, jnp.float32) / 255.0
        if mesh is not None:
            x = shard_batch(x, mesh)
        taps = model(x)
        if pool == "cls":
            f = taps[-1][1]
        else:
            f = jnp.mean(taps[-1][0], axis=1)
        feats.append(np.asarray(f))
        labels.append(np.asarray(ys).reshape(len(imgs), -1)[:, 0] if np.asarray(ys).ndim > 1
                      else np.asarray(ys))
    return np.concatenate(feats), np.concatenate(labels)
