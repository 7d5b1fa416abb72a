"""Golden parity: our CAViT/CACNN/MSDeformAttn vs the ACTUAL reference modules
(imported read-only from /root/reference) with transplanted weights.

The reference `backbones` package has no __init__.py at top level — modules are
loaded by file path with a stubbed package for the relative `ops.modules` import.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.adapters import CACNN, CAViT, adapter_geometry


def _load_reference_adapter_blocks():
    """Load /root/reference/backbones/adapter_blocks.py with its relative import."""
    pkg = types.ModuleType("refbackbones")
    pkg.__path__ = ["/root/reference/backbones"]
    sys.modules.setdefault("refbackbones", pkg)
    for name, path in [
        ("refbackbones.ops", "/root/reference/backbones/ops/__init__.py"),
        ("refbackbones.ops.modules", "/root/reference/backbones/ops/modules/__init__.py"),
        ("refbackbones.ops.modules.ms_deform_attn",
         "/root/reference/backbones/ops/modules/ms_deform_attn.py"),
        ("refbackbones.adapter_blocks", "/root/reference/backbones/adapter_blocks.py"),
    ]:
        if name in sys.modules and name != "refbackbones.adapter_blocks":
            continue
        import os

        if not os.path.exists(path):
            # ops/__init__.py may not exist — synthesize an empty package
            mod = types.ModuleType(name)
            mod.__path__ = [os.path.dirname(path)]
            sys.modules[name] = mod
            continue
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refbackbones.adapter_blocks"]


@pytest.fixture(scope="module")
def ref_blocks():
    try:
        return _load_reference_adapter_blocks()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference adapter_blocks not importable: {e}")


def _ln_params(ref_ln):
    return {"scale": ref_ln.weight.detach().numpy(), "bias": ref_ln.bias.detach().numpy()}


def _dense(ref_lin):
    return {"kernel": ref_lin.weight.detach().numpy().T, "bias": ref_lin.bias.detach().numpy()}


def _attn_params(ref_attn):
    return {
        "value_proj": _dense(ref_attn.value_proj),
        "output_proj": _dense(ref_attn.output_proj),
        "sampling_offsets": _dense(ref_attn.sampling_offsets),
        "attention_weights": _dense(ref_attn.attention_weights),
    }


DIM, HEADS, B = 32, 8, 2
H = W = 588  # the reference DWConv hard-codes 588px geometry (n = 18*18)


def _geometry():
    vit_hw = (H // 14, W // 14)
    cnn_shapes = [(H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32)]
    return vit_hw, cnn_shapes


def test_cavit_matches_reference(ref_blocks):
    torch.manual_seed(0)
    ref = ref_blocks.CAViT(dim=DIM, n_levels=3, num_heads=HEADS, init_values=0.37,
                           n_points=4, deform_ratio=1.0, with_cp=False)
    ref.eval()
    vit_hw, cnn_shapes = _geometry()
    Lq = vit_hw[0] * vit_hw[1]
    S = sum(h * w for h, w in cnn_shapes)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, Lq, DIM)).astype(np.float32)
    c = rng.standard_normal((B, S, DIM)).astype(np.float32)

    d1, d2 = ref_blocks.deform_inputs(torch.zeros(B, 3, H, W), 14)
    with torch.no_grad():
        want = ref(query=torch.from_numpy(q), reference_points=d1[0],
                   feat=torch.from_numpy(c), spatial_shapes=d1[1],
                   level_start_index=d1[2]).numpy()

    ours = CAViT(dim=DIM, num_heads=HEADS, n_points=4, n_levels=3, init_values=0.37)
    params = {
        "query_norm": _ln_params(ref.query_norm),
        "feat_norm": _ln_params(ref.feat_norm),
        "attn": _attn_params(ref.attn),
        "gamma": ref.gamma.detach().numpy(),
    }
    (ref1, shapes1), _ = adapter_geometry(vit_hw, cnn_shapes)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(q), ref1,
                                jnp.asarray(c), shapes1))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cacnn_matches_reference(ref_blocks):
    torch.manual_seed(1)
    ref = ref_blocks.CACNN(dim=DIM, n_levels=1, num_heads=HEADS, n_points=4,
                           with_cffn=True, cffn_ratio=0.25, deform_ratio=1.0,
                           drop=0.0, drop_path=0.0, with_cp=False)
    ref.eval()
    vit_hw, cnn_shapes = _geometry()
    Lq_vit = vit_hw[0] * vit_hw[1]
    S = sum(h * w for h, w in cnn_shapes)
    rng = np.random.default_rng(1)
    c = rng.standard_normal((B, S, DIM)).astype(np.float32)
    xv = rng.standard_normal((B, Lq_vit, DIM)).astype(np.float32)

    d1, d2 = ref_blocks.deform_inputs(torch.zeros(B, 3, H, W), 14)
    Hc, Wc = H // 16, W // 16
    with torch.no_grad():
        want = ref(query=torch.from_numpy(c), reference_points=d2[0],
                   feat=torch.from_numpy(xv), spatial_shapes=d2[1],
                   level_start_index=d2[2], H=Hc, W=Wc).numpy()

    ours = CACNN(dim=DIM, num_heads=HEADS, n_points=4, n_levels=1,
                 with_cffn=True, cffn_ratio=0.25)
    # DWConv: torch conv (C,1,3,3) groups=C → flax HWIO (3,3,1,C)
    dw_w = ref.ffn.dwconv.dwconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {
        "query_norm": _ln_params(ref.query_norm),
        "feat_norm": _ln_params(ref.feat_norm),
        "attn": _attn_params(ref.attn),
        "ffn_norm": _ln_params(ref.ffn_norm),
        "ffn": {
            "fc1": _dense(ref.ffn.fc1),
            "fc2": _dense(ref.ffn.fc2),
            "dwconv": {"dwconv": {"kernel": dw_w,
                                  "bias": ref.ffn.dwconv.dwconv.bias.detach().numpy()}},
        },
    }
    _, (ref2, shapes2) = adapter_geometry(vit_hw, cnn_shapes)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(c), ref2,
                                jnp.asarray(xv), shapes2,
                                query_level_shapes=cnn_shapes))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
