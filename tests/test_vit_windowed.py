"""Windowed-ViT backbone parity: our windowed Block vs the ACTUAL reference
m2f backbone Block (segmentation_m2f/models/backbones/vit.py:224-384) with
transplanted weights — including the reference's exact padding semantics
(qkv maps zero-padded AFTER the projection; padded positions participate in
the window softmax with score 0).

The reference file imports mmcv/mmseg (not in this image), so only the needed
definitions (Mlp, window helpers, WindowedAttention, Block) are ast-extracted
and exec'd against a minimal namespace.
"""

import ast
import math
from functools import partial

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.layers import Block
from adaptersis_tpu.models.vit import DinoVisionTransformer, build_backbone

REF_PATH = "/root/reference/dinov2/eval/segmentation_m2f/models/backbones/vit.py"
WANTED = {"to_2tuple", "Mlp", "window_partition", "window_reverse",
          "WindowedAttention", "Block"}


@pytest.fixture(scope="module")
def ref_ns():
    tree = ast.parse(open(REF_PATH).read())
    keep = [n for n in tree.body
            if getattr(n, "name", None) in WANTED]
    mod = ast.Module(body=keep, type_ignores=[])

    class _DropPath(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    import torch.nn.functional as F
    from typing import Callable, Optional

    ns = {"torch": torch, "nn": tnn, "F": F, "math": math, "partial": partial,
          "DropPath": _DropPath, "Attention": None, "MemEffAttention": None,
          "cp": None, "Tensor": torch.Tensor, "Optional": Optional,
          "Callable": Callable}
    exec(compile(mod, REF_PATH, "exec"), ns)
    return ns


def _dense(m):
    return {"kernel": m.weight.detach().numpy().T, "bias": m.bias.detach().numpy()}


def _ln(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


@pytest.mark.parametrize("hw", [(8, 8), (9, 7)])  # divisible + padded grids
def test_windowed_block_matches_reference(ref_ns, hw):
    torch.manual_seed(0)
    E, HEADS, WIN = 32, 4, 4
    ref = ref_ns["Block"](dim=E, num_heads=HEADS, qkv_bias=True,
                          windowed=True, window_size=WIN, layer_scale=True)
    ref.eval()
    with torch.no_grad():
        ref.gamma1.mul_(0.7)  # make LayerScale non-trivial
        ref.gamma2.mul_(1.3)

    h, w = hw
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, h * w, E)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), h, w).numpy()

    ours = Block(dim=E, num_heads=HEADS, init_values=1.0, windowed=True,
                 window_size=WIN)
    params = {
        "norm1": _ln(ref.norm1), "norm2": _ln(ref.norm2),
        "attn": {"qkv": _dense(ref.attn.qkv), "proj": _dense(ref.attn.proj)},
        "mlp": {"fc1": _dense(ref.mlp.fc1), "fc2": _dense(ref.mlp.fc2)},
        "ls1": {"gamma": ref.gamma1.detach().numpy()},
        "ls2": {"gamma": ref.gamma2.detach().numpy()},
    }
    got = np.asarray(Block(dim=E, num_heads=HEADS, init_values=1.0,
                           windowed=True, window_size=WIN).apply(
        {"params": params}, jnp.asarray(x), hw=hw))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_windowed_arch_builds_and_runs():
    """`--arch vit_small_windowed` end to end: full forward + via ViTAdapter."""
    m = build_backbone("vit_small_windowed", img_size=56, patch_size=14)
    assert any(m.window_attn) and not all(m.window_attn)
    x = jnp.zeros((1, 56, 56, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["x_norm_patchtokens"].shape == (1, 16, 384)

    from adaptersis_tpu.models.vit_adapter import ViTAdapter

    bb = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=32,
                               depth=4, num_heads=2,
                               window_attn=(True, False, True, False),
                               window_size=2)
    va = ViTAdapter(backbone=bb, deform_num_heads=4)
    x = jnp.zeros((1, 112, 112, 3))
    variables = va.init(jax.random.PRNGKey(0), x)
    feats = va.apply(variables, x)
    assert len(feats) == 4
