"""Pretrained-model entry points (reference: dinov2/hub/backbones.py:18-85 +
classifiers.py, and the DINO-v1 URL tables in utils.py:71-129).

`load_backbone(name, weights_path)` builds the matching architecture and loads a
local .pth (this environment has no egress; URLs are recorded for deployments
that do — same LVD-142M checkpoints the reference downloads).
"""

from __future__ import annotations

from typing import Optional

from .models.vit import build_backbone
from .train.convert import load_dinov2_backbone_params

_DINOV2_BASE = "https://dl.fbaipublicfiles.com/dinov2"

DINOV2_URLS = {
    "dinov2_vits14": f"{_DINOV2_BASE}/dinov2_vits14/dinov2_vits14_pretrain.pth",
    "dinov2_vitb14": f"{_DINOV2_BASE}/dinov2_vitb14/dinov2_vitb14_pretrain.pth",
    "dinov2_vitl14": f"{_DINOV2_BASE}/dinov2_vitl14/dinov2_vitl14_pretrain.pth",
    "dinov2_vitg14": f"{_DINOV2_BASE}/dinov2_vitg14/dinov2_vitg14_pretrain.pth",
    # linear classifier heads (reference hub/classifiers.py)
    "dinov2_vits14_lc": f"{_DINOV2_BASE}/dinov2_vits14/dinov2_vits14_linear_head.pth",
    "dinov2_vitb14_lc": f"{_DINOV2_BASE}/dinov2_vitb14/dinov2_vitb14_linear_head.pth",
    "dinov2_vitl14_lc": f"{_DINOV2_BASE}/dinov2_vitl14/dinov2_vitl14_linear_head.pth",
    "dinov2_vitg14_lc": f"{_DINOV2_BASE}/dinov2_vitg14/dinov2_vitg14_linear_head.pth",
}

# DINO-v1 tables (reference utils.py:71-129)
DINOV1_URLS = {
    ("vit_small", 16): "dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    ("vit_small", 8): "dino_deitsmall8_pretrain/dino_deitsmall8_pretrain.pth",
    ("vit_base", 16): "dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    ("vit_base", 8): "dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
}

_NAME2ARCH = {
    "dinov2_vits14": "vit_small",
    "dinov2_vitb14": "vit_base",
    "dinov2_vitl14": "vit_large",
    "dinov2_vitg14": "vit_giant2",
}


def build_model_for_eval(name_or_arch: str, weights_path: Optional[str] = None,
                         checkpoint_key: str = "teacher", img_size: int = 518,
                         patch_size: int = 14, dtype=None):
    """The reference's build_model_for_eval (dinov2/eval/setup.py:62-67): build the
    teacher architecture and load weights with the `teacher`-key/prefix-strip
    semantics. Returns (module, params_or_None)."""
    arch = _NAME2ARCH.get(name_or_arch, name_or_arch)
    kwargs = {} if dtype is None else {"dtype": dtype}
    model = build_backbone(arch, img_size=img_size, patch_size=patch_size, **kwargs)
    params = None
    if weights_path:
        params = {"params": load_dinov2_backbone_params(weights_path, checkpoint_key)}
    return model, params


def load_linear_head_params(weights_path: str, expect_in: Optional[int] = None):
    """Convert a `_lc` linear-head torch checkpoint ({weight, bias}) to flax
    Dense params (reference hub/classifiers.py:20-45 loads it into
    nn.Linear((1+layers)·E, 1000))."""
    import numpy as np
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    w = np.asarray(sd["weight"].numpy())
    b = np.asarray(sd["bias"].numpy())
    if expect_in is not None and w.shape[1] != expect_in:
        raise ValueError(f"linear head expects in-dim {w.shape[1]}, got {expect_in}")
    return {"kernel": w.T, "bias": b}


def linear_classifier_features(model, params, x, layers: int = 4):
    """The `_lc` wrapper's feature concat (hub/classifiers.py:47-80):
    layers=1 → [cls | mean(patch)]; layers=4 → [cls×4 | mean(last patch)]."""
    import jax.numpy as jnp

    if layers == 1:
        out = model.apply(params, x)
        return jnp.concatenate(
            [out["x_norm_clstoken"], out["x_norm_patchtokens"].mean(axis=1)], axis=1)
    if layers == 4:
        taps = model.apply(params, x, n=4, return_class_token=True,
                           method=model.get_intermediate_layers)
        return jnp.concatenate(
            [taps[0][1], taps[1][1], taps[2][1], taps[3][1],
             taps[3][0].mean(axis=1)], axis=1)
    raise ValueError(f"Unsupported number of layers: {layers}")


def linear_classifier_logits(model, params, head_params, x, layers: int = 4):
    """Full `_lc` forward → (B, 1000) ImageNet logits."""
    import jax.numpy as jnp

    feats = linear_classifier_features(model, params, x, layers)
    return feats @ jnp.asarray(head_params["kernel"]) + jnp.asarray(head_params["bias"])
