"""torch→flax weight-transplant helpers for the ACTUAL reference modules
(/root/reference, read-only import — never copied).

Used by the whole-model golden parity test (tests/test_whole_model_parity.py)
and the synthetic quality-parity harness (tools/quality_parity_synthetic.py):
load the reference's CAViT/CACNN/FeatureEncoder/FeatureDecoder/dinov2-ViT
classes by file path, then map their state into our flax parameter trees with
the standard conventions (Linear kernelᵀ, conv OIHW→HWIO, LN weight→scale).
"""

from __future__ import annotations

import importlib.util
import sys
import types


def load_reference_modules():
    """Returns (adapter_blocks, encoders_mod, decoders_mod, RefViT class).

    The reference `backbones` package has no top-level __init__; modules load
    by file path with a stubbed package for the relative ops import. The CPU
    MSDA fallback is routed around its backward-less autograd Function wrapper
    (ops/modules/ms_deform_attn.py:17-30) so torch can differentiate it."""
    import os

    pkg = types.ModuleType("refbackbones")
    pkg.__path__ = ["/root/reference/backbones"]
    sys.modules.setdefault("refbackbones", pkg)
    for name, path in [
        ("refbackbones.ops", "/root/reference/backbones/ops/__init__.py"),
        ("refbackbones.ops.modules", "/root/reference/backbones/ops/modules/__init__.py"),
        ("refbackbones.ops.modules.ms_deform_attn",
         "/root/reference/backbones/ops/modules/ms_deform_attn.py"),
        ("refbackbones.adapter_blocks", "/root/reference/backbones/adapter_blocks.py"),
        ("refbackbones.unet_parts", "/root/reference/backbones/unet_parts.py"),
    ]:
        if name in sys.modules and hasattr(sys.modules[name], "CAViT"):
            continue
        if not os.path.exists(path):
            mod = types.ModuleType(name)
            mod.__path__ = [os.path.dirname(path)]
            sys.modules[name] = mod
            continue
        if name not in sys.modules or not getattr(sys.modules[name], "__file__", None):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
    ab = sys.modules["refbackbones.adapter_blocks"]

    msda_mod = sys.modules["refbackbones.ops.modules.ms_deform_attn"]
    msda_mod.MSDeformAttnFunction.apply = staticmethod(
        lambda v, ss, lsi, loc, aw, step:
        msda_mod.ms_deform_attn_core_pytorch(v, ss, loc, aw))

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    enc = _load("ref_encoders_qp", "/root/reference/backbones/encoders.py")
    spec = importlib.util.spec_from_file_location(
        "refbackbones.decoders", "/root/reference/backbones/decoders.py")
    dec = importlib.util.module_from_spec(spec)
    sys.modules["refbackbones.decoders"] = dec
    spec.loader.exec_module(dec)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from dinov2.models.vision_transformer import DinoVisionTransformer as RefViT
    return ab, enc, dec, RefViT


def dense_params(m):
    return {"kernel": m.weight.detach().numpy().T, "bias": m.bias.detach().numpy()}


def ln_params(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def conv_params(m):
    d = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if m.bias is not None:
        d["bias"] = m.bias.detach().numpy()
    return d


def bn_params(m):
    return ({"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()},
            {"mean": m.running_mean.detach().numpy(), "var": m.running_var.detach().numpy()})


def msda_params(a):
    return {"value_proj": dense_params(a.value_proj),
            "output_proj": dense_params(a.output_proj),
            "sampling_offsets": dense_params(a.sampling_offsets),
            "attention_weights": dense_params(a.attention_weights)}


def cavit_params(ref):
    return {"query_norm": ln_params(ref.query_norm), "feat_norm": ln_params(ref.feat_norm),
            "attn": msda_params(ref.attn), "gamma": ref.gamma.detach().numpy()}


def cacnn_params(ref):
    dw = ref.ffn.dwconv.dwconv
    return {
        "query_norm": ln_params(ref.query_norm), "feat_norm": ln_params(ref.feat_norm),
        "attn": msda_params(ref.attn), "ffn_norm": ln_params(ref.ffn_norm),
        "ffn": {"fc1": dense_params(ref.ffn.fc1), "fc2": dense_params(ref.ffn.fc2),
                "dwconv": {"dwconv": {
                    "kernel": dw.weight.detach().numpy().transpose(2, 3, 1, 0),
                    "bias": dw.bias.detach().numpy()}}},
    }


def encoder_params(ref):
    params, stats = {}, {}
    stem = list(ref.stem)
    for i, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7)], start=1):
        p, s = bn_params(stem[bi])
        params[f"stem{i}"] = {"conv": conv_params(stem[ci]), "bn": p}
        stats[f"stem{i}"] = {"bn": s}
    for name, seq in [("conv2", ref.conv2), ("conv3", ref.conv3), ("conv4", ref.conv4)]:
        p, s = bn_params(seq[1])
        params[name] = {"conv": conv_params(seq[0]), "bn": p}
        stats[name] = {"bn": s}
    for name in ("fc1", "fc2", "fc3", "fc4"):
        params[name] = conv_params(getattr(ref, name))
    return params, stats


def decoder_params(ref):
    params, stats = {}, {}
    for i in range(1, 5):
        seq = getattr(ref, f"decoder_{i}")
        p, s = bn_params(seq[1])
        params[f"decoder_{i}"] = {"conv": conv_params(seq[0]), "bn": p}
        stats[f"decoder_{i}"] = {"bn": s}
    params["final_out"] = conv_params(ref.final_out)
    return params, stats
