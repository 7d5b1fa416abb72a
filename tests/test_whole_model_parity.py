"""Whole-model golden parity: the FULL composed AdapterSegmentor forward (and one
backward's per-module grad norms) vs the reference's inline per-step wiring
(/root/reference/train.py:268-428) run in torch on CPU with transplanted weights.

Module-level parity (CAViT/CACNN/ViT/encoder/decoder) is covered elsewhere; this
test exists to catch WIRING bugs — tap-add placement, decoder-concat order,
level_embed application, both frozen walks, the per-round block interleave —
which every module test would miss.

Geometry is the reference-mandated 588 px (the CACNN DWConv hard-codes the
588/8-16-32 pyramid split, adapter_blocks.py:62-80); dims are shrunk (E=64,
depth=6, heads=2) so the double CPU walk stays fast.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from adaptersis_tpu.losses import dc_loss
from adaptersis_tpu.models.segmentor import AdapterSegmentor
from adaptersis_tpu.models.vit import DinoVisionTransformer
from adaptersis_tpu.train.convert import (_flatten_chunked_block_keys,
                                          convert_dinov2_backbone)

sys.path.insert(0, "/root/reference")

E, DEPTH, HEADS, N_LAST = 64, 6, 2, 4
INPLANES = 16
FEATURES = (E, 32, 16, 12, 8)
H = W = 588
B = 1


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_reference_modules():
    pkg = types.ModuleType("refbackbones")
    pkg.__path__ = ["/root/reference/backbones"]
    sys.modules.setdefault("refbackbones", pkg)
    import os

    for name, path in [
        ("refbackbones.ops", "/root/reference/backbones/ops/__init__.py"),
        ("refbackbones.ops.modules", "/root/reference/backbones/ops/modules/__init__.py"),
        ("refbackbones.ops.modules.ms_deform_attn",
         "/root/reference/backbones/ops/modules/ms_deform_attn.py"),
        ("refbackbones.adapter_blocks", "/root/reference/backbones/adapter_blocks.py"),
        ("refbackbones.unet_parts", "/root/reference/backbones/unet_parts.py"),
    ]:
        if name in sys.modules and not sys.modules[name].__dict__.get("__file__"):
            pass
        if name in sys.modules and name.count(".") and hasattr(sys.modules[name], "CAViT"):
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
    enc = _load("ref_encoders_wm", "/root/reference/backbones/encoders.py")
    # decoders.py imports unet_parts relatively through the package
    sys.modules.setdefault("refbackbones.unet_parts", sys.modules.get("refbackbones.unet_parts"))
    spec = importlib.util.spec_from_file_location(
        "refbackbones.decoders", "/root/reference/backbones/decoders.py")
    dec = importlib.util.module_from_spec(spec)
    sys.modules["refbackbones.decoders"] = dec
    spec.loader.exec_module(dec)
    from dinov2.models.vision_transformer import DinoVisionTransformer as RefViT
    return ab, enc, dec, RefViT


# ---- torch→flax weight maps (same conventions as the module parity tests) ----

def _dense(m):
    return {"kernel": m.weight.detach().numpy().T, "bias": m.bias.detach().numpy()}


def _ln(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def _conv(m):
    d = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if m.bias is not None:
        d["bias"] = m.bias.detach().numpy()
    return d


def _bn(m):
    return ({"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()},
            {"mean": m.running_mean.detach().numpy(), "var": m.running_var.detach().numpy()})


def _attn_params(a):
    return {"value_proj": _dense(a.value_proj), "output_proj": _dense(a.output_proj),
            "sampling_offsets": _dense(a.sampling_offsets),
            "attention_weights": _dense(a.attention_weights)}


def _cavit_params(ref):
    return {"query_norm": _ln(ref.query_norm), "feat_norm": _ln(ref.feat_norm),
            "attn": _attn_params(ref.attn), "gamma": ref.gamma.detach().numpy()}


def _cacnn_params(ref):
    dw = ref.ffn.dwconv.dwconv
    return {
        "query_norm": _ln(ref.query_norm), "feat_norm": _ln(ref.feat_norm),
        "attn": _attn_params(ref.attn), "ffn_norm": _ln(ref.ffn_norm),
        "ffn": {"fc1": _dense(ref.ffn.fc1), "fc2": _dense(ref.ffn.fc2),
                "dwconv": {"dwconv": {
                    "kernel": dw.weight.detach().numpy().transpose(2, 3, 1, 0),
                    "bias": dw.bias.detach().numpy()}}},
    }


def _encoder_params(ref):
    params, stats = {}, {}
    stem = list(ref.stem)
    for i, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7)], start=1):
        p, s = _bn(stem[bi])
        params[f"stem{i}"] = {"conv": _conv(stem[ci]), "bn": p}
        stats[f"stem{i}"] = {"bn": s}
    for name, seq in [("conv2", ref.conv2), ("conv3", ref.conv3), ("conv4", ref.conv4)]:
        p, s = _bn(seq[1])
        params[name] = {"conv": _conv(seq[0]), "bn": p}
        stats[name] = {"bn": s}
    for name in ("fc1", "fc2", "fc3", "fc4"):
        params[name] = _conv(getattr(ref, name))
    return params, stats


def _decoder_params(ref):
    params, stats = {}, {}
    for i in range(1, 5):
        seq = getattr(ref, f"decoder_{i}")
        p, s = _bn(seq[1])
        params[f"decoder_{i}"] = {"conv": _conv(seq[0]), "bn": p}
        stats[f"decoder_{i}"] = {"bn": s}
    params["final_out"] = _conv(ref.final_out)
    return params, stats


def _reference_pipeline(mods, inp, target):
    """train.py:268-428 inline wiring, verbatim in structure (eval mode, fp32).
    Returns (logits NCHW, loss, grad-norms per trainable module)."""
    ab, vit, enc, cross_vit, cross_cnn, seg_dec = mods
    from einops import rearrange

    deform_inputs1, deform_inputs2 = ab.deform_inputs(inp, 14)
    H_c, W_c = inp.shape[2] // 16, inp.shape[3] // 16
    level_embed = tnn.Parameter(torch.zeros(3, E))  # train.py:277 — zeros each step

    c1, c2, c3, c4 = enc(inp)
    c2 = c2 + level_embed[0]
    c3 = c3 + level_embed[1]
    c4 = c4 + level_embed[2]
    c = torch.cat([c2, c3, c4], dim=1)

    with torch.no_grad():
        x_tokens_list = vit.get_intermediate_layers(inp, N_LAST, return_class_token=True)
        taps = [x_tokens_list[i][0] for i in range(N_LAST)]  # oldest..newest
        output_vit = taps[-1]
        x = vit.patch_embed(inp)
        for blk in vit.blocks[0:-3]:
            x = blk(x)

    outputs = []
    for r in range(N_LAST):
        if r > 0:
            with torch.no_grad():
                i = -N_LAST + r
                for blk in vit.blocks[i:i + 1] if i + 1 != 0 else vit.blocks[-1:]:
                    x = blk(x)
        x = cross_vit(query=x, reference_points=deform_inputs1[0], feat=c,
                      spatial_shapes=deform_inputs1[1],
                      level_start_index=deform_inputs1[2])
        c = cross_cnn(query=c, reference_points=deform_inputs2[0], feat=x,
                      spatial_shapes=deform_inputs2[1],
                      level_start_index=deform_inputs2[2], H=H_c, W=W_c)
        x = x + taps[r]
        outputs.append(x)

    output_last = outputs[-1]
    hp = inp.shape[2] // 14
    output_last = rearrange(output_last, "b (h w) c -> b c h w", h=hp)
    output_vit = rearrange(output_vit, "b (h w) c -> b c h w", h=hp)
    c4m = rearrange(c4, "b (h w) c -> b c h w", h=inp.shape[2] // 32)
    diffy = output_last.size()[2] - c4m.size()[2]
    diffx = output_last.size()[3] - c4m.size()[3]
    c4m = torch.nn.functional.pad(c4m, [diffx // 2, diffx - diffx // 2,
                                        diffy // 2, diffy - diffy // 2])
    # NOTE: the reference wraps this reshape+concat in no_grad (train.py:389-406,
    # the §2.12 frozen-head bug); parity_frozen_head=False is our default, so the
    # torch side here keeps grads — same wiring, bug disabled on both sides.
    output_last_cat = torch.cat((output_last, c4m, output_vit), dim=1)
    output = seg_dec(output_last_cat)
    output = torch.nn.functional.interpolate(output, size=(H, W), mode="bilinear")

    from importlib import import_module
    DC = _load("ref_dice_wm", "/root/reference/segloss/dice.py").DC  # noqa: N806
    # DC.onehot calls .cuda(); shapes match after unsqueeze → scatter path unused
    sm = tnn.Softmax(1)(output)
    tgt1h = torch.zeros_like(sm).scatter_(1, target.unsqueeze(1).long(), 1)
    loss_mod = DC(2)
    loss = loss_mod.dice(sm, tgt1h)

    loss.backward()

    def gnorm(m):
        return float(torch.sqrt(sum((p.grad ** 2).sum() for p in m.parameters()
                                    if p.grad is not None)))

    return (output.detach().numpy(), float(loss),
            {"cross_vit": gnorm(cross_vit), "cross_cnn": gnorm(cross_cnn),
             "encoder": gnorm(enc), "decoder": gnorm(seg_dec)})


@pytest.fixture(scope="module")
def parity_setup():
    try:
        ab, encmod, decmod, RefViT = _load_reference_modules()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference modules not importable: {e}")

    # The published reference wraps its CPU MSDA fallback in an autograd
    # Function with NO backward (ops/modules/ms_deform_attn.py:17-30 — the
    # intended CUDA op implements one); route around the wrapper so torch can
    # differentiate the same math.
    msda_mod = sys.modules["refbackbones.ops.modules.ms_deform_attn"]
    msda_mod.MSDeformAttnFunction.apply = staticmethod(
        lambda v, ss, lsi, loc, aw, step:
        msda_mod.ms_deform_attn_core_pytorch(v, ss, loc, aw))

    torch.manual_seed(0)
    vit = RefViT(img_size=518, patch_size=14, embed_dim=E, depth=DEPTH,
                 num_heads=HEADS, mlp_ratio=4, block_chunks=0, init_values=1e-5)
    vit.eval()
    enc = encmod.FeatureEncoder(inplanes=INPLANES, embed_dim=E)
    cross_vit = ab.CAViT(dim=E, n_levels=3, num_heads=8, init_values=0.0,
                         n_points=4, deform_ratio=1.0, with_cp=False)
    cross_cnn = ab.CACNN(dim=E, n_levels=1, num_heads=8, n_points=4,
                         with_cffn=True, cffn_ratio=0.25, deform_ratio=1.0,
                         drop=0.0, drop_path=0.0, with_cp=False)
    seg_dec = decmod.FeatureDecoder(num_classes=2, features=list(FEATURES))
    for m in (enc, seg_dec):
        for mm in m.modules():
            if isinstance(mm, torch.nn.modules.batchnorm._BatchNorm):
                mm.running_mean.normal_(0, 0.1)
                mm.running_var.uniform_(0.5, 1.5)
    for m in (enc, cross_vit, cross_cnn, seg_dec):
        m.eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    target = (rng.uniform(size=(B, H, W)) > 0.7).astype(np.int64)

    logits_ref, loss_ref, gnorms_ref = _reference_pipeline(
        (ab, vit, enc, cross_vit, cross_cnn, seg_dec),
        torch.from_numpy(x), torch.from_numpy(target))

    # ---- ours, transplanted ----
    backbone = DinoVisionTransformer(img_size=518, patch_size=14, embed_dim=E,
                                     depth=DEPTH, num_heads=HEADS)
    model = AdapterSegmentor(backbone=backbone, num_classes=2,
                             n_last_blocks=N_LAST, encoder_inplanes=INPLANES,
                             decoder_features=FEATURES, msda_impl="gather")
    sd = _flatten_chunked_block_keys(
        {k: v.detach().numpy() for k, v in vit.state_dict().items()})
    enc_p, enc_s = _encoder_params(enc)
    dec_p, dec_s = _decoder_params(seg_dec)
    params = {
        "backbone": convert_dinov2_backbone(sd),
        "encoder": enc_p,
        "decoder": dec_p,
        "cross_vit": _cavit_params(cross_vit),
        "cross_cnn": _cacnn_params(cross_cnn),
        "level_embed": np.zeros((3, E), np.float32),
    }
    variables = {"params": params,
                 "batch_stats": {"encoder": enc_s, "decoder": dec_s}}
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    tj = jnp.asarray(target)
    return model, variables, xj, tj, logits_ref, loss_ref, gnorms_ref


def test_whole_model_forward_matches_reference(parity_setup):
    model, variables, xj, tj, logits_ref, _, _ = parity_setup
    got = np.asarray(model.apply(variables, xj)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, logits_ref, rtol=2e-3, atol=2e-3)


def test_whole_model_grad_norms_match_reference(parity_setup):
    model, variables, xj, tj, _, loss_ref, gnorms_ref = parity_setup

    def loss_fn(params):
        logits = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]}, xj)
        # reference double softmax: Softmax at train.py:424 + inside DC.dice
        return dc_loss(jax.nn.softmax(logits, axis=-1), tj)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert abs(float(loss) - loss_ref) < 2e-4, (float(loss), loss_ref)

    def gnorm(tree):
        return float(jnp.sqrt(sum((g.astype(jnp.float64) ** 2).sum()
                                  for g in jax.tree_util.tree_leaves(tree))))

    for mod in ("cross_vit", "cross_cnn", "encoder", "decoder"):
        ours = gnorm(grads[mod])
        ref = gnorms_ref[mod]
        assert abs(ours - ref) <= 5e-3 * max(abs(ref), 1e-6), (mod, ours, ref)
