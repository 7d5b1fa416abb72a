"""DINOv2 PyTorch checkpoint → Flax parameter tree converter.

Reproduces the reference load semantics (dinov2/utils/utils.py:21-39): take the
`checkpoint_key` sub-dict (default "teacher") if present, strip "module." and
"backbone." prefixes, then map into our DinoVisionTransformer layout:

  torch                         flax (this repo)
  patch_embed.proj.weight  →    patch_embed/proj/kernel   (OIHW → HWIO)
  cls_token / pos_embed    →    cls_token / pos_embed
  blocks.N.norm1.weight    →    blocks_N/norm1/scale
  blocks.N.attn.qkv.weight →    blocks_N/attn/qkv/kernel  ((3C,C) → (C,3C))
  blocks.N.ls1.gamma       →    blocks_N/ls1/gamma
  blocks.N.mlp.fc1.weight  →    blocks_N/mlp/fc1/kernel   (SwiGLU: w12/w3)
  norm.weight              →    norm/scale

Runs entirely on CPU numpy; torch is only needed to unpickle .pth files.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str, checkpoint_key: str = "teacher") -> Dict[str, np.ndarray]:
    """torch.load a .pth and normalize to flat {name: np.ndarray}
    (dinov2/utils/utils.py:21-33 semantics)."""
    import torch  # CPU-only unpickling

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and checkpoint_key in blob:
        blob = blob[checkpoint_key]
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    out = {}
    for k, v in blob.items():
        k = k.replace("module.", "").replace("backbone.", "")
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def _flatten_chunked_block_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """FSDP 'chunked blocks' checkpoints use blocks.<chunk>.<idx>.… — flatten to
    blocks.<idx>.… (dinov2/models/vision_transformer.py:140-150)."""
    out = {}
    pat = re.compile(r"^blocks\.(\d+)\.(\d+)\.(.*)$")
    for k, v in sd.items():
        m = pat.match(k)
        if m and any(kk.startswith(f"blocks.{m.group(1)}.{m.group(2)}.") for kk in sd):
            # chunked iff a doubled index level exists; keep the inner index
            out[f"blocks.{m.group(2)}.{m.group(3)}"] = v
        else:
            out[k] = v
    return out


def convert_dinov2_backbone(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Flat torch state dict → nested flax params for DinoVisionTransformer."""
    sd = dict(sd)
    params: Dict[str, Any] = {}

    def dense(prefix: str) -> Dict[str, np.ndarray]:
        d = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
        if f"{prefix}.bias" in sd:
            d["bias"] = sd[f"{prefix}.bias"]
        return d

    def ln(prefix: str) -> Dict[str, np.ndarray]:
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params["patch_embed"] = {
        "proj": {
            "kernel": np.ascontiguousarray(sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        }
    }
    params["cls_token"] = sd["cls_token"]
    params["pos_embed"] = sd["pos_embed"]
    if "mask_token" in sd:
        params["mask_token"] = sd["mask_token"]
    if "register_tokens" in sd:
        params["register_tokens"] = sd["register_tokens"]

    depth = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(depth):
        p = f"blocks.{i}"
        blk: Dict[str, Any] = {
            "norm1": ln(f"{p}.norm1"),
            "attn": {"qkv": dense(f"{p}.attn.qkv"), "proj": dense(f"{p}.attn.proj")},
            "norm2": ln(f"{p}.norm2"),
        }
        if f"{p}.ls1.gamma" in sd:
            blk["ls1"] = {"gamma": sd[f"{p}.ls1.gamma"]}
            blk["ls2"] = {"gamma": sd[f"{p}.ls2.gamma"]}
        if f"{p}.mlp.fc1.weight" in sd:
            blk["mlp"] = {"fc1": dense(f"{p}.mlp.fc1"), "fc2": dense(f"{p}.mlp.fc2")}
        else:  # SwiGLU (vit_giant2)
            blk["mlp"] = {"w12": dense(f"{p}.mlp.w12"), "w3": dense(f"{p}.mlp.w3")}
        params[f"blocks_{i}"] = blk
    params["norm"] = ln("norm")
    return params


def load_dinov2_backbone_params(path: str, checkpoint_key: str = "teacher") -> Dict[str, Any]:
    sd = _flatten_chunked_block_keys(load_torch_state_dict(path, checkpoint_key))
    return convert_dinov2_backbone(sd)
