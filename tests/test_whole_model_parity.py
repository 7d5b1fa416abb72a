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


from adaptersis_tpu.train.ref_transplant import (  # noqa: E402
    bn_params as _bn, cacnn_params as _cacnn_params,
    cavit_params as _cavit_params, conv_params as _conv,
    decoder_params as _decoder_params, dense_params as _dense,
    encoder_params as _encoder_params, ln_params as _ln,
    load_reference_modules)


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

    spec = importlib.util.spec_from_file_location(
        "ref_dice_wm", "/root/reference/segloss/dice.py")
    dice_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dice_mod)
    DC = dice_mod.DC  # noqa: N806
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
        ab, encmod, decmod, RefViT = load_reference_modules()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference modules not importable: {e}")

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
