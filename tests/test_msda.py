"""Golden parity: our XLA-gather deformable attention vs the published
grid_sample formulation executed with torch on CPU (the reference's
ms_deform_attn_core_pytorch math, backbones/ops/modules/ms_deform_attn.py:33-54).

The torch model here is an independent test-side implementation of the public
Deformable-DETR math, used only as an oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from adaptersis_tpu.ops.ms_deform_attn import ms_deform_attn_core


def torch_oracle(value, shapes, locations, weights):
    """grid_sample-based multiscale deformable attention (public math)."""
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = locations.shape
    chunks = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * locations - 1
    taps = []
    for l, (h, w) in enumerate(shapes):
        v = chunks[l].flatten(2).transpose(1, 2).reshape(N * M, D, h, w)
        g = grids[:, :, :, l].transpose(1, 2).flatten(0, 1)  # (N*M, Lq, P, 2)
        taps.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )  # (N*M, D, Lq, P)
    att = weights.transpose(1, 2).reshape(N * M, 1, Lq, L * P)
    out = (torch.stack(taps, dim=-2).flatten(-2) * att).sum(-1).view(N, M * D, Lq)
    return out.transpose(1, 2).contiguous()


@pytest.mark.parametrize("shapes", [[(8, 8), (4, 4), (2, 2)], [(7, 5)]])
def test_msda_core_matches_grid_sample(shapes):
    rng = np.random.default_rng(0)
    N, M, D, Lq, P = 2, 4, 8, 9, 4
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.standard_normal((N, S, M, D), dtype=np.float32)
    # include out-of-bounds locations to exercise zero padding
    locations = rng.uniform(-0.2, 1.2, size=(N, Lq, M, L, P, 2)).astype(np.float32)
    weights = rng.uniform(size=(N, Lq, M, L, P)).astype(np.float32)
    weights /= weights.reshape(N, Lq, M, -1).sum(-1, keepdims=True).reshape(N, Lq, M, 1, 1)

    want = torch_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(locations), torch.from_numpy(weights)
    ).numpy()
    got = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(locations), jnp.asarray(weights))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_msda_module_runs_and_identity_at_init():
    """At init, attention_weights = softmax(0) (uniform) and offsets follow the
    directional bias — output_proj is xavier so output is nonzero but finite."""
    import jax
    from adaptersis_tpu.ops.ms_deform_attn import MSDeformAttn
    from adaptersis_tpu.models.adapters import get_reference_points

    shapes = [(6, 6), (3, 3)]
    S = sum(h * w for h, w in shapes)
    mod = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2)
    q = jnp.ones((1, 5, 32))
    feat = jnp.ones((1, S, 32))
    ref = jnp.broadcast_to(jnp.asarray(get_reference_points([(5, 1)])), (1, 5, 2, 2))
    params = mod.init(jax.random.PRNGKey(0), q, ref, feat, shapes)
    out = mod.apply(params, q, ref, feat, shapes)
    assert out.shape == (1, 5, 32)
    assert np.isfinite(np.asarray(out)).all()
