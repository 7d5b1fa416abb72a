"""Multi-scale deformable attention, TPU-native.

This is the single most performance-critical op in the framework (reference:
/root/reference/backbones/ops/modules/ms_deform_attn.py; the PyTorch repo ships only a
grid_sample fallback, :33-54, and points at the Deformable-DETR CUDA kernel as the
production path, :34-35).

Math (identical to the reference):
  for each query q, head m, level l, point p:
    loc   = reference_point[q, l] + offset[q, m, l, p] / (W_l, H_l)         (:161-166)
    # grid_sample(align_corners=False, padding zeros) with grid = 2*loc - 1 (:39,47-49)
    x_pix = loc_x * W_l - 0.5 ; y_pix = loc_y * H_l - 0.5
    tap   = bilinear(value_l[m], x_pix, y_pix)  (zeros outside)
  out[q, m] = sum_{l,p} softmax_weights[q, m, l, p] * tap

TPU formulation: the 4 bilinear corner taps of all points/levels become ONE
`take_along_axis` per level over the MINOR (lane) axis of a (B, M, D, S) value
buffer — the only gather layout TPUs execute fast (see _msda_core_impl) — with the
weight-multiply + corner/point reduction folded into a single einsum. The core is
jax.checkpoint'd so the backward rematerializes gathers instead of storing them.

The reference forces this op to fp32 under AMP (custom_fwd(cast_inputs=float32),
:19); we do the same by upcasting inside `ms_deform_attn_core`.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _msda_core_impl(value, sampling_locations, attention_weights, *, spatial_shapes):
    """Lane-axis gather formulation.

    CRITICAL TPU layout fact (measured on v5e): take_along_axis over a *major*
    axis of a (B, M, S, D) buffer runs at ~0.03 GB/s in bf16 (50 s for 115 MB!),
    while the same gather over the MINOR (lane) axis of (B, M, D, S) runs at
    ~7 GB/s — a >1000× difference. So value is transposed once to put the
    spatial axis minormost and every corner tap is a lane gather.
    """
    B, S, M, D = value.shape
    Lq, L, P = sampling_locations.shape[1], sampling_locations.shape[3], sampling_locations.shape[4]
    v = value.transpose(0, 2, 3, 1)                    # (B, M, D, S)
    out = jnp.zeros((B, M, D, Lq), jnp.float32)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(v, start, H * W, axis=3)
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)   # (B, Lq, M, P, 2)
        aw = attention_weights[:, :, :, lvl].astype(jnp.float32)     # (B, Lq, M, P)
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # merge the 4 bilinear corners into ONE gather (and one scatter in the
        # backward) — fewer gather ops at identical byte volume
        idx_list, cw_list = [], []
        for xi, yi, w in (
            (x0i, y0i, (1 - tx) * (1 - ty)),
            (x0i + 1, y0i, tx * (1 - ty)),
            (x0i, y0i + 1, (1 - tx) * ty),
            (x0i + 1, y0i + 1, tx * ty),
        ):
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # (B, Lq, M, P)
            idx_list.append(idx.transpose(0, 2, 1, 3).reshape(B, M, Lq * P))
            cw_list.append(
                (w * valid.astype(w.dtype) * aw).transpose(0, 2, 1, 3).reshape(B, M, Lq * P)
            )
        idx_all = jnp.concatenate(idx_list, axis=-1)          # (B, M, 4*Lq*P)
        cw_all = jnp.concatenate(cw_list, axis=-1)
        g = jnp.take_along_axis(v_l, idx_all[:, :, None, :], axis=3)  # (B, M, D, 4LqP)
        # fold weight-multiply + corner/point reduction into one contraction so the
        # f32 product never materializes
        out = out + jnp.einsum(
            "bmdcqp,bmcqp->bmdq",
            g.reshape(B, M, D, 4, Lq, P),
            cw_all.reshape(B, M, 4, Lq, P).astype(g.dtype),
            preferred_element_type=jnp.float32,
        )
        start += H * W
    assert start == S, f"sum of spatial shapes {start} != value length {S}"
    return out.transpose(0, 3, 1, 2).reshape(B, Lq, M * D)


def ms_deform_attn_core(
    value: jax.Array,                       # (B, S_total, M, D)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W), ...]
    sampling_locations: jax.Array,          # (B, Lq, M, L, P, 2) in [0,1]
    attention_weights: jax.Array,           # (B, Lq, M, L, P), softmaxed over L*P
    force_fp32: bool = True,
) -> jax.Array:
    """Reference math of ms_deform_attn_core_pytorch (:33-54), XLA-gather form.

    Returns (B, Lq, M*D) in value.dtype.

    force_fp32=True upcasts the sampled values to fp32 (the reference AMP boundary,
    custom_fwd(cast_inputs=float32), :19). With False the gathers run in the input
    dtype (bf16 on TPU) with fp32 accumulation — half the HBM traffic/transients;
    coordinates and softmax weights stay fp32 either way.

    The whole core is jax.checkpoint'd: the backward pass recomputes the corner
    gathers instead of storing the (B, Lq, M, P, D) transients — at 588px/ViT-L
    those dominate HBM (220 MB apiece) and rematerialization is nearly free
    (gathers are bandwidth-bound, the step is MXU-bound).
    """
    in_dtype = value.dtype
    if force_fp32:
        value = value.astype(jnp.float32)
    core = jax.checkpoint(
        functools.partial(_msda_core_impl, spatial_shapes=tuple(spatial_shapes))
    )
    out = core(value, sampling_locations, attention_weights.astype(jnp.float32))
    return out.astype(in_dtype)


def _directional_offset_bias(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Reference sampling_offsets bias init: unit directions scaled by point index
    (ms_deform_attn.py:100-112)."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttn(nn.Module):
    """Deformable attention module (reference MSDeformAttn, ms_deform_attn.py:63-185).

    `spatial_shapes` must be static python ints — on TPU each (imsize, arch) pair is
    its own jit specialization; the reference's runtime shape tensors
    (input_spatial_shapes) become compile-time constants.
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    ratio: float = 1.0
    # reference parity: the op is forced to fp32 under AMP (:19). On the bf16 TPU
    # path we default to bf16 gathers + fp32 accumulation instead (half the HBM
    # transients); set force_fp32=True for bit-parity benchmarking.
    force_fp32: bool = False
    # "gather" (lane-axis take_along_axis) | "matmul" (dense sampling-matrix MXU
    # formulation with a hand-written VJP, ops/msda_matmul.py) | "pallas"
    # (Mosaic kernel, VMEM-resident sampling matrix with locality skipping,
    # ops/msda_pallas.py; auto-falls back to "matmul" on unsupported geometry)
    impl: str = "gather"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                        # (B, Lq, C)
        reference_points: jax.Array,             # (B, Lq, n_levels, 2) in [0,1]
        input_flatten: jax.Array,                # (B, S_total, C)
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        if self.d_model % self.n_heads:
            raise ValueError(f"d_model {self.d_model} not divisible by n_heads {self.n_heads}")
        d_value = int(self.d_model * self.ratio)
        B, Lq, _ = query.shape
        S = input_flatten.shape[1]
        assert sum(h * w for h, w in spatial_shapes) == S, (spatial_shapes, S)

        value = nn.Dense(
            d_value,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="value_proj",
        )(input_flatten)
        value = value.reshape(B, S, self.n_heads, d_value // self.n_heads)

        offsets = nn.Dense(
            self.n_heads * self.n_levels * self.n_points * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(
                _directional_offset_bias(self.n_heads, self.n_levels, self.n_points)
            ),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="sampling_offsets",
        )(query).reshape(B, Lq, self.n_heads, self.n_levels, self.n_points, 2)

        weights = nn.Dense(
            self.n_heads * self.n_levels * self.n_points,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="attention_weights",
        )(query).reshape(B, Lq, self.n_heads, self.n_levels * self.n_points)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).reshape(
            B, Lq, self.n_heads, self.n_levels, self.n_points
        )

        # normalize offsets by (W_l, H_l) and add to per-level reference points (:161-166)
        normalizer = jnp.asarray([(w, h) for h, w in spatial_shapes], jnp.float32)  # (L, 2)
        locations = (
            reference_points[:, :, None, :, None, :].astype(jnp.float32)
            + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
        )

        shapes_t = tuple(tuple(hw) for hw in spatial_shapes)
        impl = self.impl
        if impl == "pallas":
            from . import msda_pallas

            if not msda_pallas.supported(
                    shapes_t, D=d_value // self.n_heads, Lq=Lq,
                    P=self.n_points,
                    dtype_bytes=jnp.dtype(self.dtype).itemsize):
                impl = "matmul"
        if impl == "pallas":
            from .msda_pallas import msda_pallas as _pallas_op

            out = _pallas_op(value, locations, weights,
                             shapes_t).astype(value.dtype)
        elif impl == "matmul":
            from .msda_matmul import msda_matmul

            out = msda_matmul(value, locations, weights,
                              shapes_t).astype(value.dtype)
        else:
            out = ms_deform_attn_core(
                value, spatial_shapes, locations, weights,
                force_fp32=self.force_fp32 or self.dtype == jnp.float32,
            )
        return nn.Dense(
            self.d_model,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="output_proj",
        )(out.astype(self.dtype))
