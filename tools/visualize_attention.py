#!/usr/bin/env python
"""Attention-map visualization (reference: tools/visualize_attention.py).

Loads a ViT checkpoint, computes per-head [CLS]→patch attention of the last block,
upsamples to image resolution, saves per-head grayscale maps and thresholded
attention-mass masks (reference :38-95).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser("visualize_attention")
    p.add_argument("--arch", default="vit_small")
    p.add_argument("--patch_size", default=14, type=int)
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--checkpoint_key", default="teacher", type=str)
    p.add_argument("--image_path", default=None, type=str)
    p.add_argument("--image_size", default=(448, 448), type=int, nargs="+")
    p.add_argument("--output_dir", default=".", type=str)
    p.add_argument("--threshold", type=float, default=0.6,
                   help="keep this fraction of total attention mass (ref :49)")
    p.add_argument("--platform", default=None, type=str)
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from adaptersis_tpu.models.vit import build_backbone
    from adaptersis_tpu.train.convert import load_dinov2_backbone_params

    model = build_backbone(args.arch, img_size=518, patch_size=args.patch_size)

    h, w = (args.image_size * 2)[:2]
    h, w = h - h % args.patch_size, w - w % args.patch_size
    if args.image_path:
        img = Image.open(args.image_path).convert("RGB").resize((w, h), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
    else:
        print("no --image_path provided, using random noise")
        x = np.random.default_rng(0).uniform(size=(h, w, 3)).astype(np.float32)
    x = jnp.asarray(x)[None]

    if args.pretrained_weights and os.path.isfile(args.pretrained_weights):
        params = {"params": load_dinov2_backbone_params(args.pretrained_weights,
                                                        args.checkpoint_key)}
    else:
        print("no pretrained weights found, using random init")
        params = model.init(jax.random.PRNGKey(0), x)

    attn = model.apply(params, x, method=model.get_last_selfattention)
    attn = np.asarray(attn)[0]                      # (heads, N, N)
    nh = attn.shape[0]
    wf, hf = w // args.patch_size, h // args.patch_size
    cls_attn = attn[:, 0, 1:].reshape(nh, hf, wf)   # CLS → patches

    os.makedirs(args.output_dir, exist_ok=True)
    # thresholded attention-mass masks (ref :60-70)
    flat = cls_attn.reshape(nh, -1)
    flat = flat / flat.sum(axis=1, keepdims=True)
    order = np.argsort(flat, axis=1)
    sorted_vals = np.take_along_axis(flat, order, axis=1)
    cum = np.cumsum(sorted_vals, axis=1)
    keep = cum > (1 - args.threshold)
    masks = np.zeros_like(flat)
    np.put_along_axis(masks, order, keep.astype(np.float32), axis=1)
    masks = masks.reshape(nh, hf, wf)

    for j in range(nh):
        m = cls_attn[j] / max(cls_attn[j].max(), 1e-9)
        Image.fromarray((m * 255).astype(np.uint8)).resize((w, h), Image.NEAREST).save(
            os.path.join(args.output_dir, f"attn-head{j}.png"))
        Image.fromarray((masks[j] * 255).astype(np.uint8)).resize((w, h), Image.NEAREST).save(
            os.path.join(args.output_dir, f"mask_th{args.threshold}_head{j}.png"))
    print(f"saved {nh} attention maps to {args.output_dir}")


if __name__ == "__main__":
    main()
