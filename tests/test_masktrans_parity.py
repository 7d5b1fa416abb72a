"""Golden transplant parity: our MaskTransformer vs the ACTUAL reference classes.

The reference lives in two read-only files:
  * backbones/masktrans_block.py (Block/Attention/FeedForward) — needs timm,
    which isn't in this image: DropPath/trunc_normal_ are stubbed (~20 lines,
    eval runs with drop_path_rate=0 so DropPath is the identity in eval mode).
  * eval/eval_dinov2_masktrans.py:389-465 (init_weights + MaskTransformer) —
    the script's module-level imports pull matplotlib/dinov2/eval_knn, so ONLY
    those two definitions are extracted with ast and exec'd against a minimal
    namespace.

Weights are transplanted torch→flax and outputs compared at the real eval
geometry (392 px, patch 14 → 28×28 tokens, d_model 1536,
eval_dinov2_masktrans.py:134-139).
"""

import ast
import importlib.util
import math
import sys
import types

import numpy as np
import pytest
import torch
from torch import nn

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.masktrans import MaskTransformer


def _stub_timm():
    """timm.models.layers.{DropPath, trunc_normal_} — the only timm surface the
    reference files touch."""
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = torch.bernoulli(torch.full((x.shape[0],) + (1,) * (x.ndim - 1), keep))
            return x / keep * mask

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std)
            tensor.clamp_(min=mean + a * std, max=mean + b * std)
        return tensor

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    timm.models = models
    models.layers = layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)
    return layers


def _load_reference():
    layers = _stub_timm()
    spec = importlib.util.spec_from_file_location(
        "ref_masktrans_block", "/root/reference/backbones/masktrans_block.py")
    blk = importlib.util.module_from_spec(spec)
    sys.modules["ref_masktrans_block"] = blk
    spec.loader.exec_module(blk)

    src = open("/root/reference/eval/eval_dinov2_masktrans.py").read()
    tree = ast.parse(src)
    wanted = [n for n in tree.body
              if (isinstance(n, ast.ClassDef) and n.name == "MaskTransformer")
              or (isinstance(n, ast.FunctionDef) and n.name == "init_weights")]
    assert len(wanted) == 2, [getattr(n, "name", "?") for n in wanted]
    from einops import rearrange

    ns = {"torch": torch, "nn": nn, "F": torch.nn.functional,
          "rearrange": rearrange, "trunc_normal_": layers.trunc_normal_,
          "Block": blk.Block, "FeedForward": blk.FeedForward}
    exec(compile(ast.Module(body=wanted, type_ignores=[]), "<ref>", "exec"), ns)
    return ns["MaskTransformer"]


def _t2n(t):
    return np.asarray(t.detach().numpy())


def test_masktrans_transplant_parity_392px():
    RefMaskTransformer = _load_reference()
    torch.manual_seed(0)
    dim, n_cls, patch = 1536, 2, 14
    ref = RefMaskTransformer(n_cls=n_cls, patch_size=patch, d_encoder=dim,
                             n_layers=2, d_ff=4 * dim, d_model=dim,
                             n_heads=dim // 64, drop_path_rate=0.0, dropout=0.1)
    ref.eval()

    ours = MaskTransformer(n_cls=n_cls, patch_size=patch, d_encoder=dim,
                           n_layers=2, d_model=dim)
    H = W = 392
    gs = H // patch
    rng = np.random.default_rng(0)
    tokens = rng.standard_normal((1, gs * gs, dim)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(tokens), (H, W))["params"]

    # ---- transplant torch → flax ----
    p = jax.tree_util.tree_map(np.asarray, params)
    sd = ref.state_dict()

    def dense(dst, name):
        dst["kernel"] = _t2n(sd[f"{name}.weight"]).T
        dst["bias"] = _t2n(sd[f"{name}.bias"])

    def lnorm(dst, name):
        dst["scale"] = _t2n(sd[f"{name}.weight"])
        dst["bias"] = _t2n(sd[f"{name}.bias"])

    dense(p["proj_dec"], "proj_dec")
    p["cls_emb"] = _t2n(sd["cls_emb"])
    p["proj_patch"] = _t2n(sd["proj_patch"])
    p["proj_classes"] = _t2n(sd["proj_classes"])
    lnorm(p["decoder_norm"], "decoder_norm")
    lnorm(p["mask_norm"], "mask_norm")
    for i in range(2):
        b = p[f"blocks_{i}"]
        lnorm(b["norm1"], f"blocks.{i}.norm1")
        lnorm(b["norm2"], f"blocks.{i}.norm2")
        dense(b["attn"]["qkv"], f"blocks.{i}.attn.qkv")
        dense(b["attn"]["proj"], f"blocks.{i}.attn.proj")
        dense(b["mlp_fc1"], f"blocks.{i}.mlp.fc1")
        dense(b["mlp_fc2"], f"blocks.{i}.mlp.fc2")

    with torch.no_grad():
        want = _t2n(ref(torch.from_numpy(tokens), (H, W)))        # (1, n_cls, gs, gs)
    got = np.asarray(ours.apply({"params": jax.tree_util.tree_map(jnp.asarray, p)},
                                jnp.asarray(tokens), (H, W)))      # (1, gs, gs, n_cls)
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
