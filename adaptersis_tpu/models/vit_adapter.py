"""ViTAdapter — the upstream 'done right' adapter backbone that the paper's
inline wiring was distilled from (reference:
dinov2/eval/segmentation_m2f/models/backbones/vit_adapter.py:20-217 +
adapter_modules.py:173-265).

Differences from AdapterSegmentor's reference-parity wiring (train.py):
  * level_embed is a REAL trainable parameter with normal init (:60,90)
  * interactions run over `interaction_indexes` block RANGES with the injector
    BEFORE each range and the extractor after (InteractionBlock :236-265), with
    optional extra extractors on the last stage
  * outputs an FPN pyramid [f1..f4]: extractor pyramid split back to maps,
    ConvTranspose 2× up for f1, optional add of interpolated per-stage ViT
    features, 4 BatchNorms (SyncBN ≙ global-batch BN here) (:190-216)

Our CAViT/CACNN ARE the Injector/Extractor (renamed in the paper's code); reused
directly. The backbone is our DinoVisionTransformer; its cls token rides along
outside the adapter exchanges (InteractionBlockWithCls behavior).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .adapters import CACNN, CAViT, adapter_geometry
from .encoders import FeatureEncoder
from .vit import DinoVisionTransformer

Dtype = Any


class ViTAdapter(nn.Module):
    backbone: DinoVisionTransformer
    interaction_indexes: Optional[Sequence[Tuple[int, int]]] = None
    deform_num_heads: int = 8
    n_points: int = 4
    init_values: float = 0.0
    cffn_ratio: float = 0.25
    deform_ratio: float = 1.0
    add_vit_feature: bool = True
    use_extra_extractor: bool = True
    freeze_vit: bool = False
    # deformable-attention impl for every injector/extractor (see
    # ops/ms_deform_attn.MSDeformAttn.impl): "pallas" is the TPU fast path
    msda_impl: str = "gather"
    dtype: Dtype = jnp.float32

    def _indexes(self):
        if self.interaction_indexes is not None:
            return self.interaction_indexes
        d = self.backbone.depth
        q = d // 4
        return [(0, q - 1), (q, 2 * q - 1), (2 * q, 3 * q - 1), (3 * q, d - 1)]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        E = self.backbone.embed_dim
        B, H, W, _ = x.shape
        p = self.backbone.patch_size
        hp, wp = H // p, W // p
        idxs = self._indexes()
        sg = jax.lax.stop_gradient if self.freeze_vit else (lambda t: t)

        c1, c2, c3, c4, cnn_shapes = FeatureEncoder(
            embed_dim=E, dtype=self.dtype, name="spm")(x, train=train)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (3, E), jnp.float32)
        le = level_embed.astype(c2.dtype)
        c2, c3, c4 = c2 + le[0], c3 + le[1], c4 + le[2]
        n2, n3 = c2.shape[1], c3.shape[1]
        c = jnp.concatenate([c2, c3, c4], axis=1)
        (ref1, shapes1), (ref2, shapes2) = adapter_geometry((hp, wp), cnn_shapes)

        tokens, _ = self.backbone.embed(x, with_pos_cls=True)
        cls, xt = tokens[:, :1], tokens[:, 1:]

        outs = []
        for i, (lo, hi) in enumerate(idxs):
            injector = CAViT(dim=E, num_heads=self.deform_num_heads,
                             n_points=self.n_points, n_levels=3,
                             init_values=self.init_values, dtype=self.dtype,
                             msda_impl=self.msda_impl,
                             name=f"interactions_{i}_injector")
            extractor = CACNN(dim=E, num_heads=self.deform_num_heads,
                              n_points=self.n_points, n_levels=1,
                              cffn_ratio=self.cffn_ratio, dtype=self.dtype,
                              msda_impl=self.msda_impl,
                              name=f"interactions_{i}_extractor")
            xt = injector(xt, ref1, c, shapes1)
            blk_in = jnp.concatenate([cls, xt], axis=1)
            blk_out = sg(self.backbone.run_blocks(blk_in, lo, hi + 1, hw=(hp, wp)))
            cls, xt = blk_out[:, :1], blk_out[:, 1:]
            c = extractor(c, ref2, xt, shapes2, query_level_shapes=shapes1)
            if i == len(idxs) - 1 and self.use_extra_extractor:
                for j in range(2):
                    c = CACNN(dim=E, num_heads=self.deform_num_heads,
                              n_points=self.n_points, n_levels=1,
                              cffn_ratio=self.cffn_ratio, dtype=self.dtype,
                              msda_impl=self.msda_impl,
                              name=f"extra_extractor_{j}")(
                        c, ref2, xt, shapes2, query_level_shapes=shapes1)
            outs.append(xt.reshape(B, hp, wp, E))

        # split pyramid back to maps
        (h2, w2), (h3, w3), (h4, w4) = cnn_shapes
        c2m = c[:, :n2].reshape(B, h2, w2, E)
        c3m = c[:, n2 : n2 + n3].reshape(B, h3, w3, E)
        c4m = c[:, n2 + n3 :].reshape(B, h4, w4, E)
        c1m = nn.ConvTranspose(E, (2, 2), strides=(2, 2), dtype=self.dtype,
                               param_dtype=jnp.float32, name="up")(c2m)
        if c1m.shape[1:3] != c1.shape[1:3]:
            c1m = resize_bilinear(c1m, c1.shape[1:3])
        c1m = c1m + c1

        if self.add_vit_feature:
            x1, x2, x3, x4 = outs
            c1m = c1m + resize_bilinear(x1, c1m.shape[1:3])
            c2m = c2m + resize_bilinear(x2, (h2, w2))
            c3m = c3m + resize_bilinear(x3, (h3, w3))
            c4m = c4m + resize_bilinear(x4, (h4, w4))

        feats = []
        for i, f in enumerate([c1m, c2m, c3m, c4m], start=1):
            f = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"norm{i}")(f)
            feats.append(f)
        return feats
