"""DINO projection head (reference: dinov2/layers/dino_head.py:12-59).

3-layer GELU MLP (in → hidden → hidden → bottleneck) → L2-normalize →
weight-normed final linear to prototype logits with the g-scale initialized to 1.
Weight norm here is explicit: w_eff = g · v/‖v‖ per output column.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import trunc_normal_init

Dtype = Any


class DINOHead(nn.Module):
    out_dim: int
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    mlp_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        nlayers = max(self.nlayers, 1)
        dims = [self.hidden_dim] * (nlayers - 1) + [self.bottleneck_dim]
        if nlayers == 1:
            dims = [self.bottleneck_dim]
        for i, d in enumerate(dims):
            x = nn.Dense(d, use_bias=self.mlp_bias, kernel_init=trunc_normal_init(0.02),
                         dtype=self.dtype, param_dtype=jnp.float32, name=f"mlp_{i}")(x)
            if i < len(dims) - 1:
                x = jax.nn.gelu(x, approximate=False)
        # L2 normalize (eps 1e-12 fp32 path, dino_head.py:38-39)
        x = x.astype(jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        # weight-normed last layer, no bias, g init 1 (dino_head.py:27-28)
        v = self.param("last_layer_v", trunc_normal_init(0.02),
                       (self.bottleneck_dim, self.out_dim), jnp.float32)
        g = self.param("last_layer_g", nn.initializers.ones, (self.out_dim,), jnp.float32)
        w = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12) * g
        return x @ w
