"""CNN spatial-prior encoder (reference: /root/reference/backbones/encoders.py).

FeatureEncoder = SpatialPriorModule clone: conv stem to /4, three stride-2 stages to
/8 /16 /32, 1×1 projections to embed_dim; c1 stays spatial, c2..c4 are flattened to
tokens (:49-74).

Exact conv arithmetic matters: MSDeformAttn asserts sum(H*W) == token length
(ms_deform_attn.py:150) and deform_inputs assumes (h//8, h//16, h//32) grids
(adapter_blocks.py:26-27). At 588px the reference's padding choices (conv2/conv3
padding=0, conv4 padding=1) produce exactly 73/36/18 — we reproduce those paddings.

SyncBatchNorm (reference :12-41) → plain flax BatchNorm computed on the *global*
batch view: under jit + GSPMD sharding the batch-axis mean/var reductions are
cross-replica collectives automatically, which IS synced BN — no torch-style
process-group machinery needed.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        # torch BN defaults: eps 1e-5, momentum 0.1 → flax momentum 0.9
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


class FeatureEncoder(nn.Module):
    """Spatial-prior pyramid encoder (encoders.py:4-74). NHWC in, returns
    (c1 spatial (B,H/4,W/4,E), c2 (B,N8,E), c3 (B,N16,E), c4 (B,N32,E))."""

    inplanes: int = 64
    embed_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        p = self.inplanes
        # stem: conv s2 p1 → 2×(conv s1 p1) → maxpool k3 s2 p1   (/4)
        x = ConvBNRelu(p, 3, 2, 1, dtype=self.dtype, name="stem1")(x, train)
        x = ConvBNRelu(p, 3, 1, 1, dtype=self.dtype, name="stem2")(x, train)
        x = ConvBNRelu(p, 3, 1, 1, dtype=self.dtype, name="stem3")(x, train)
        c1 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # conv2/conv3 stride-2 padding-0 (VALID), conv4 stride-2 padding-1 — this
        # reproduces the reference's 73/36/18 grids at 588px.
        c2 = ConvBNRelu(2 * p, 3, 2, 0, dtype=self.dtype, name="conv2")(c1, train)
        c3 = ConvBNRelu(4 * p, 3, 2, 0, dtype=self.dtype, name="conv3")(c2, train)
        c4 = ConvBNRelu(8 * p, 3, 2, 1, dtype=self.dtype, name="conv4")(c3, train)

        def proj(name, y):
            return nn.Conv(
                self.embed_dim, kernel_size=(1, 1), use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )(y)

        c1p = proj("fc1", c1)
        c2p = proj("fc2", c2)
        c3p = proj("fc3", c3)
        c4p = proj("fc4", c4)

        B = x.shape[0]
        flat = lambda y: y.reshape(B, -1, self.embed_dim)
        return c1p, flat(c2p), flat(c3p), flat(c4p), (c2p.shape[1:3], c3p.shape[1:3], c4p.shape[1:3])


class PreViT(nn.Module):
    """2D feature map → patch tokens (backbones/engines.py:1-67 `pre_vit`).

    Unused by any reference trainer (the ViT's own patch embed covers the
    image path), but part of the reference's public backbone surface:
    conv(kernel=stride=patch_size) projection from `in_chans` feature planes
    to `embed_dim` tokens, optional norm, optional (B, H', W', D) unflatten
    via `flatten_embedding=False`. NHWC in/out (reference is NCHW)."""

    patch_size: int = 14
    in_chans: int = 256
    embed_dim: int = 384
    use_norm: bool = False
    flatten_embedding: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, _ = x.shape
        p = self.patch_size
        assert H % p == 0, f"Input image height {H} is not a multiple of patch height {p}"
        assert W % p == 0, f"Input image width {W} is not a multiple of patch width: {p}"
        x = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p),
                    padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
                    name="proj")(x)
        Hp, Wp = x.shape[1], x.shape[2]
        x = x.reshape(B, Hp * Wp, self.embed_dim)
        if self.use_norm:
            # torch nn.LayerNorm default eps (the reference passes the class)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name="norm")(x)
        if not self.flatten_embedding:
            x = x.reshape(B, Hp, Wp, self.embed_dim)
        return x
