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
