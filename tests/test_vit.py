"""Backbone tests: shape/jit behavior + golden parity against the actual reference
DINOv2 implementation (imported read-only from /root/reference) through the weight
converter."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.vit import build_backbone, vit_small
from adaptersis_tpu.train.convert import _flatten_chunked_block_keys, convert_dinov2_backbone

sys.path.insert(0, "/root/reference")


def tiny_backbone(**kw):
    return build_backbone("vit_small", img_size=56, patch_size=14, **kw)


def test_forward_shapes():
    m = tiny_backbone()
    x = jnp.zeros((2, 56, 56, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["x_norm_patchtokens"].shape == (2, 16, 384)
    assert out["x_norm_clstoken"].shape == (2, 384)


def test_intermediate_layers_count_and_pos_interp():
    m = tiny_backbone()
    x = jnp.zeros((1, 56, 56, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x, n=4, return_class_token=True, method=m.get_intermediate_layers)
    assert len(outs) == 4
    patch, cls = outs[0]
    assert patch.shape == (1, 16, 384)
    # different input resolution → pos-embed interpolation path
    x2 = jnp.zeros((1, 84, 84, 3))
    outs2 = m.apply(params, x2, n=2, method=m.get_intermediate_layers)
    assert outs2[0].shape == (1, 36, 384)


@pytest.mark.parametrize("imsize", [56, 112])
def test_parity_vs_reference_dinov2(imsize):
    """Build the reference DinoVisionTransformer (vendored Meta code, imported from
    the read-only mount), convert its random weights, compare full forwards."""
    try:
        from dinov2.models.vision_transformer import vit_small as ref_vit_small
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference dinov2 not importable: {e}")

    torch.manual_seed(0)
    ref = ref_vit_small(img_size=56, patch_size=14, init_values=1e-5)
    ref.eval()
    sd = _flatten_chunked_block_keys(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )

    ours = build_backbone("vit_small", img_size=56, patch_size=14)
    params = {"params": convert_dinov2_backbone(sd)}

    x = np.random.default_rng(5).standard_normal((2, 3, imsize, imsize)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_features(torch.from_numpy(x))
    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(got["x_norm_clstoken"]), want["x_norm_clstoken"].numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["x_norm_patchtokens"]), want["x_norm_patchtokens"].numpy(), rtol=2e-3, atol=2e-3
    )

    # intermediate layers too
    with torch.no_grad():
        want_taps = ref.get_intermediate_layers(torch.from_numpy(x), n=3, norm=True)
    got_taps = ours.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), n=3, method=ours.get_intermediate_layers
    )
    for g, w in zip(got_taps, want_taps):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=2e-3, atol=2e-3)
