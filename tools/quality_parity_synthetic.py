#!/usr/bin/env python
"""Synthetic quality parity vs the ACTUAL reference training math (VERDICT r2 #4).

Runs the reference's per-step wiring + loss + SGD (train.py:268-441, torch CPU,
tiny dims at the mandatory 588 px) and OUR trainer math in LOCKSTEP: identical
transplanted init, identical synthetic batches, identical SGD(momentum .99,
wd 3e-5) — then compares per-step train-loss curves and periodic val
Dice / acc1 against the 0.3 pt north-star bar (BASELINE.md).

This is the no-real-dataset stand-in for tools/quality_parity.py: it proves the
TRAINING DYNAMICS match, not just a single forward (the whole-model parity test
covers that). The real-data path (quality_parity.py) is unchanged.

    python tools/quality_parity_synthetic.py --steps 30 --out /tmp/qps
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

E, DEPTH, HEADS, N_LAST = 64, 6, 2, 4
INPLANES = 16
FEATURES = (E, 32, 16, 12, 8)
IMSIZE = 588  # the reference CACNN DWConv hard-codes the 588 pyramid split
LR, MOMENTUM, WD = 0.01, 0.99, 3e-5


def set_flagship_geometry():
    """Switch the lockstep to the REAL recipe architecture (VERDICT r4 #3):
    ViT-L/14 @588 (depth 24, dim 1024, heads 16) + the reference encoder/
    decoder defaults (encoders.py:5, decoders.py:93) — catches depth-24/
    dim-1024/pos-grid-42² effects the E=64/depth-6 toy cannot."""
    global E, DEPTH, HEADS, INPLANES, FEATURES
    E, DEPTH, HEADS = 1024, 24, 16
    INPLANES = 64
    FEATURES = (1024, 512, 256, 128, 64)


def synth_batch(rng, b):
    """Blob segmentation: a bright disc on noise; same arrays feed both sides."""
    imgs = rng.uniform(0.0, 0.6, (b, IMSIZE, IMSIZE, 3)).astype(np.float32)
    masks = np.zeros((b, IMSIZE, IMSIZE), np.int64)
    yy, xx = np.mgrid[:IMSIZE, :IMSIZE]
    for i in range(b):
        cy, cx = rng.uniform(150, 438, 2)
        r = rng.uniform(60, 150)
        disc = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
        imgs[i][disc] = np.clip(imgs[i][disc] + 0.4, 0, 1)
        masks[i][disc] = 1
    return imgs, masks


# ---------------- torch reference side ----------------

def build_reference():
    import torch

    from adaptersis_tpu.train.ref_transplant import load_reference_modules

    ab, encmod, decmod, RefViT = load_reference_modules()
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
    return ab, vit, enc, cross_vit, cross_cnn, seg_dec


def ref_forward(mods, inp, train: bool):
    """train.py:268-422 wiring → logits (B, 2, H, W)."""
    import torch
    from einops import rearrange
    from torch import nn as tnn

    ab, vit, enc, cross_vit, cross_cnn, seg_dec = mods
    for m in (enc, cross_vit, cross_cnn, seg_dec):
        m.train(train)
    deform_inputs1, deform_inputs2 = ab.deform_inputs(inp, 14)
    H_c, W_c = inp.shape[2] // 16, inp.shape[3] // 16
    level_embed = torch.zeros(3, E)  # train.py:277 — fresh zeros every step

    c1, c2, c3, c4 = enc(inp)
    c2, c3, c4 = c2 + level_embed[0], c3 + level_embed[1], c4 + level_embed[2]
    c = torch.cat([c2, c3, c4], dim=1)

    with torch.no_grad():
        x_tokens_list = vit.get_intermediate_layers(inp, N_LAST, return_class_token=True)
        taps = [x_tokens_list[i][0] for i in range(N_LAST)]
        output_vit = taps[-1]
        x = vit.patch_embed(inp)
        for blk in vit.blocks[0:-3]:
            x = blk(x)

    for r in range(N_LAST):
        if r > 0:
            with torch.no_grad():
                i = -N_LAST + r
                blks = vit.blocks[i:i + 1] if i + 1 != 0 else vit.blocks[-1:]
                for blk in blks:
                    x = blk(x)
        x = cross_vit(query=x, reference_points=deform_inputs1[0], feat=c,
                      spatial_shapes=deform_inputs1[1],
                      level_start_index=deform_inputs1[2])
        c = cross_cnn(query=c, reference_points=deform_inputs2[0], feat=x,
                      spatial_shapes=deform_inputs2[1],
                      level_start_index=deform_inputs2[2], H=H_c, W=W_c)
        x = x + taps[r]

    hp = inp.shape[2] // 14
    out_last = rearrange(x, "b (h w) c -> b c h w", h=hp)
    out_vit = rearrange(output_vit, "b (h w) c -> b c h w", h=hp)
    c4m = rearrange(c4, "b (h w) c -> b c h w", h=inp.shape[2] // 32)
    dy = out_last.size()[2] - c4m.size()[2]
    dx = out_last.size()[3] - c4m.size()[3]
    c4m = torch.nn.functional.pad(c4m, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
    out = seg_dec(torch.cat((out_last, c4m, out_vit), dim=1))
    return torch.nn.functional.interpolate(out, size=inp.shape[2:], mode="bilinear")


def ref_loss(logits, target):
    import importlib.util

    import torch
    from torch import nn as tnn

    spec = importlib.util.spec_from_file_location(
        "ref_dice_qp", "/root/reference/segloss/dice.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sm = tnn.Softmax(1)(logits)  # train.py:424 + DC's internal softmax = double
    tgt1h = torch.zeros_like(sm).scatter_(1, target.unsqueeze(1).long(), 1)
    return mod.DC(2).dice(sm, tgt1h)


def run_reference(steps, eval_every, batch, out_dir):
    import torch

    mods = build_reference()
    _, vit, enc, cross_vit, cross_cnn, seg_dec = mods
    opt = torch.optim.SGD(
        [{"params": cross_cnn.parameters()}, {"params": cross_vit.parameters()},
         {"params": enc.parameters()}, {"params": seg_dec.parameters()}],
        lr=LR, momentum=MOMENTUM, weight_decay=WD)  # train.py:178-192

    data_rng = np.random.default_rng(1234)
    losses, vals = [], {}
    val_imgs, val_masks = synth_batch(np.random.default_rng(999), 4)
    for it in range(steps):
        imgs, masks = synth_batch(data_rng, batch)
        inp = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        tgt = torch.from_numpy(masks)
        logits = ref_forward(mods, inp, train=True)
        loss = ref_loss(logits, tgt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        print(f"[ref] step {it}: loss {float(loss):.4f}", flush=True)
        if (it + 1) % eval_every == 0 or it == steps - 1:
            vals[it] = ref_validate(mods, val_imgs, val_masks)
            print(f"[ref] step {it}: val {vals[it]}", flush=True)
    return {"loss_curve": losses, "val": vals}


def ref_validate(mods, imgs, masks):
    import torch

    with torch.no_grad():
        logits = ref_forward(mods, torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                             train=False)
        pred = logits.argmax(1).numpy()
        acc1 = float((pred == masks).mean())
        dice = 1.0 - float(ref_loss(logits, torch.from_numpy(masks)))
    return {"acc1": acc1, "dice": dice}


# ---------------- our side ----------------

def run_ours(steps, eval_every, batch, out_dir):
    import jax
    import jax.numpy as jnp
    import torch

    from adaptersis_tpu.losses import dc_loss
    from adaptersis_tpu.models.segmentor import AdapterSegmentor
    from adaptersis_tpu.models.vit import DinoVisionTransformer
    from adaptersis_tpu.train.convert import (_flatten_chunked_block_keys,
                                              convert_dinov2_backbone)
    from adaptersis_tpu.train.ref_transplant import (cacnn_params, cavit_params,
                                                     decoder_params,
                                                     encoder_params)

    mods = build_reference()  # fresh, same torch seed → identical init
    _, vit, enc, cross_vit, cross_cnn, seg_dec = mods

    backbone = DinoVisionTransformer(img_size=518, patch_size=14, embed_dim=E,
                                     depth=DEPTH, num_heads=HEADS)
    model = AdapterSegmentor(backbone=backbone, num_classes=2,
                             n_last_blocks=N_LAST, encoder_inplanes=INPLANES,
                             decoder_features=FEATURES, msda_impl="gather")
    sd = _flatten_chunked_block_keys(
        {k: v.detach().numpy() for k, v in vit.state_dict().items()})
    enc_p, enc_s = encoder_params(enc)
    dec_p, dec_s = decoder_params(seg_dec)
    frozen = {"backbone": convert_dinov2_backbone(sd)}
    params = {"encoder": enc_p, "decoder": dec_p,
              "cross_vit": cavit_params(cross_vit),
              "cross_cnn": cacnn_params(cross_cnn)}
    stats = {"encoder": enc_s, "decoder": dec_s}

    def forward(params, stats, x, train):
        variables = {"params": {**params, **frozen,
                                "level_embed": jnp.zeros((3, E))},
                     "batch_stats": stats}
        if train:
            return model.apply(variables, x, train=True, mutable=["batch_stats"])
        return model.apply(variables, x), stats

    @jax.jit
    def train_step(params, mom, stats, x, y):
        def loss_fn(p):
            logits, mut = forward(p, stats, x, True)
            return dc_loss(jax.nn.softmax(logits, axis=-1), y), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # torch SGD semantics (train.py:178-192): buf = μ·buf + (g + wd·p);
        # p ← p − lr·buf
        def upd(p, g, m):
            m_new = MOMENTUM * m + g + WD * p
            return p - LR * m_new, m_new

        flat = jax.tree_util.tree_map(upd, params, grads, mom)
        new_params = jax.tree_util.tree_map(lambda t: t[0], flat,
                                            is_leaf=lambda t: isinstance(t, tuple))
        new_mom = jax.tree_util.tree_map(lambda t: t[1], flat,
                                         is_leaf=lambda t: isinstance(t, tuple))
        return new_params, new_mom, new_stats, loss

    @jax.jit
    def val_fn(params, stats, x, y):
        logits, _ = forward(params, stats, x, False)
        acc1 = (jnp.argmax(logits, -1) == y).mean()
        dice = 1.0 - dc_loss(jax.nn.softmax(logits, axis=-1), y)
        return acc1, dice

    mom = jax.tree_util.tree_map(jnp.zeros_like, params)
    data_rng = np.random.default_rng(1234)
    losses, vals = [], {}
    val_imgs, val_masks = synth_batch(np.random.default_rng(999), 4)
    vx, vy = jnp.asarray(val_imgs), jnp.asarray(val_masks)
    for it in range(steps):
        imgs, masks = synth_batch(data_rng, batch)
        params, mom, stats, loss = train_step(params, mom, stats,
                                              jnp.asarray(imgs),
                                              jnp.asarray(masks))
        losses.append(float(loss))
        print(f"[ours] step {it}: loss {float(loss):.4f}", flush=True)
        if (it + 1) % eval_every == 0 or it == steps - 1:
            a, d = val_fn(params, stats, vx, vy)
            vals[it] = {"acc1": float(a), "dice": float(d)}
            print(f"[ours] step {it}: val {vals[it]}", flush=True)
    return {"loss_curve": losses, "val": vals}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--eval_every", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tolerance", type=float, default=0.003,
                    help="0.3 pt — the BASELINE.md north-star bar")
    ap.add_argument("--out", default="/tmp/quality_parity_synthetic")
    ap.add_argument("--flagship", action="store_true",
                    help="run at the real ViT-L/14 geometry (slow on CPU; "
                         "use --steps 5 --batch 1)")
    args = ap.parse_args()
    if args.flagship:
        set_flagship_geometry()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_platforms", "cpu")

    ref = run_reference(args.steps, args.eval_every, args.batch, out)
    ours = run_ours(args.steps, args.eval_every, args.batch, out)

    last = str(max(int(k) for k in ref["val"]))
    rows, ok = [], True
    for metric in ("dice", "acc1"):
        r = ref["val"][int(last)][metric]
        o = ours["val"][int(last)][metric]
        passed = abs(o - r) <= args.tolerance or o > r
        ok &= passed
        rows.append((metric, o, r, o - r, "PASS" if passed else "FAIL"))
    curve_dev = float(np.max(np.abs(np.asarray(ref["loss_curve"])
                                    - np.asarray(ours["loss_curve"]))))
    report = ["| metric | ours | reference-torch | Δ | verdict |",
              "|---|---|---|---|---|"]
    for m, o, r, d, v in rows:
        report.append(f"| {m} | {o:.4f} | {r:.4f} | {d:+.4f} | {v} |")
    report.append(f"\nmax per-step train-loss deviation over {args.steps} "
                  f"lockstep steps: {curve_dev:.5f}")
    text = "\n".join(report)
    print(text)
    (out / "parity_synthetic.md").write_text(text + "\n")
    (out / "parity_synthetic.json").write_text(json.dumps(
        {"reference": ref, "ours": ours, "rows": rows, "parity_ok": ok,
         "max_loss_curve_dev": curve_dev, "tolerance": args.tolerance}, indent=2))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
