"""Exact DINO-v1 ViT parity: our DinoV1VisionTransformer vs the ACTUAL
reference root module (/root/reference/vision_transformer.py:134-256) with
transplanted weights — forward (normed patch tokens), get_intermediate_layers
(full tokens incl. cls), get_last_selfattention, at native and interpolated
resolutions (the +0.1 bicubic fudge path)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.vit import build_backbone
from adaptersis_tpu.train.convert import convert_dinov2_backbone


def _load_ref_v1():
    # root vision_transformer.py does `from utils import trunc_normal_`;
    # provide a stub so we don't import the reference's heavy utils module
    utils_stub = types.ModuleType("utils")

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
        return tensor

    utils_stub.trunc_normal_ = trunc_normal_
    had = sys.modules.get("utils")
    sys.modules["utils"] = utils_stub
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_vit_v1", "/root/reference/vision_transformer.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if had is not None:
            sys.modules["utils"] = had
        else:
            sys.modules.pop("utils", None)
    return mod


@pytest.mark.parametrize("imsize", [64, 96])  # 96 exercises pos interpolation
def test_v1_matches_reference(imsize):
    ref_mod = _load_ref_v1()
    torch.manual_seed(0)
    ref = ref_mod.vit_tiny(patch_size=16, img_size=[64], drop_path_rate=0.0)
    ref.eval()

    ours = build_backbone("vit_tiny_v1", img_size=64, patch_size=16)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_dinov2_backbone(sd)
    # v1 has no mask token; our shared stack always declares one — zero it
    params.setdefault("mask_token", np.zeros((1, 192), np.float32))
    variables = {"params": params}

    x = np.random.default_rng(0).standard_normal((2, 3, imsize, imsize)).astype(np.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, xj))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    with torch.no_grad():
        want_taps = [t.numpy() for t in
                     ref.get_intermediate_layers(torch.from_numpy(x), n=3)]
    got_taps = ours.apply(variables, xj, n=3, method=ours.get_intermediate_layers)
    assert len(got_taps) == 3
    for g, w in zip(got_taps, want_taps):
        assert g.shape == w.shape  # FULL tokens incl. cls — the v1 delta
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-3, atol=2e-3)

    with torch.no_grad():
        want_attn = ref.get_last_selfattention(torch.from_numpy(x)).numpy()
    got_attn = np.asarray(ours.apply(variables, xj,
                                     method=ours.get_last_selfattention))
    np.testing.assert_allclose(got_attn, want_attn, rtol=2e-3, atol=2e-3)
