#!/usr/bin/env python
"""ViT-Adapter + Mask2Former segmentation trainer — the runnable surface for the
reference's segmentation_m2f tree (reference: dinov2/eval/eval_adapter.py was an
inference-only mmseg demo; this trains the stack end to end).

Architecture: frozen (or trainable) DINOv2 → ViTAdapter FPN → Mask2FormerHead;
loss = Hungarian-matched class + point-sampled mask BCE + dice over all decoder
layers; eval = semantic inference → dice / acc1.

  python segment_m2f.py --synthetic --platform cpu --imsize 112 --epochs 1 ...
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


def get_args_parser():
    p = argparse.ArgumentParser("segment-m2f")
    p.add_argument("--arch", default="vit_small")
    p.add_argument("--patch_size", default=14, type=int)
    p.add_argument("--imsize", default=518, type=int)
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--checkpoint_key", default="teacher", type=str)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--dataset", default="robomis", type=str)
    p.add_argument("--num_classes", default=2, type=int)
    p.add_argument("--num_queries", default=100, type=int)
    p.add_argument("--feat_channels", default=256, type=int)
    p.add_argument("--num_decoder_layers", default=9, type=int)
    p.add_argument("--msda_impl", default="gather",
                   choices=["gather", "matmul", "pallas"],
                   help="deformable-attention impl for adapter + pixel decoder"
                        " (pallas = the Mosaic TPU kernel)")
    p.add_argument("--epochs", default=50, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--batch_size_per_gpu", default=4, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--output_dir", default=".", type=str)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", default=None, type=str)
    p.add_argument("--seed", default=0, type=int)
    return p


def main(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import linen as nn

    from adaptersis_tpu.data import DATASETS, DataLoader, EpochSampler, SyntheticSeg
    from adaptersis_tpu.losses import dc_loss, pixel_accuracy
    from adaptersis_tpu.models.mask2former import Mask2FormerHead, mask2former_semantic_inference
    from adaptersis_tpu.models.m2f_loss import m2f_total_loss, semantic_to_instances
    from adaptersis_tpu.models.vit import build_backbone
    from adaptersis_tpu.models.vit_adapter import ViTAdapter
    from adaptersis_tpu.train import load_dinov2_backbone_params, restore_checkpoint, save_checkpoint
    from adaptersis_tpu.utils import MetricLogger

    class Model(nn.Module):
        backbone: object

        @nn.compact
        def __call__(self, x, train: bool = False):
            feats = ViTAdapter(backbone=self.backbone, freeze_vit=True,
                               msda_impl=args.msda_impl,
                               name="adapter")(x, train=train)
            return Mask2FormerHead(
                num_classes=args.num_classes, num_queries=args.num_queries,
                feat_channels=args.feat_channels,
                num_decoder_layers=args.num_decoder_layers, name="head",
                msda_impl=args.msda_impl,
            )(feats, train=train)

    backbone = build_backbone(args.arch, img_size=518, patch_size=args.patch_size)
    model = Model(backbone=backbone)

    if args.synthetic:
        ds_train = SyntheticSeg(n=4 * args.batch_size_per_gpu, imsize=args.imsize,
                                num_classes=args.num_classes, seed=args.seed)
        ds_val = SyntheticSeg(n=2 * args.batch_size_per_gpu, imsize=args.imsize,
                              num_classes=args.num_classes, seed=args.seed + 1)
    else:
        ds_cls = DATASETS[args.dataset]
        ds_train = ds_cls(args.data_path, split="training", imsize=args.imsize)
        ds_val = ds_cls(args.data_path, split="validation", imsize=args.imsize)
    sampler = EpochSampler(len(ds_train), seed=args.seed)
    loader = DataLoader(ds_train, sampler=sampler, batch_size=args.batch_size_per_gpu,
                        num_workers=args.num_workers)
    val_loader = DataLoader(ds_val, batch_size=args.batch_size_per_gpu,
                            num_workers=args.num_workers, drop_last=False)

    max_seg = args.num_classes  # per-class semantic instances
    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, args.imsize, args.imsize, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(rng, x0, train=False)
    params = dict(variables["params"])
    if args.pretrained_weights:
        params["adapter"] = dict(params["adapter"])
        # ViTAdapter holds the backbone params under its scope
        bb = load_dinov2_backbone_params(args.pretrained_weights, args.checkpoint_key)
        params["backbone"] = bb
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    sem2inst = jax.vmap(lambda m: semantic_to_instances(m, args.num_classes, max_seg))

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs_u8, masks, key):
        x = imgs_u8.astype(jnp.float32) / 255.0
        gt_masks, gt_labels = sem2inst(masks)

        def loss_fn(p):
            (cls_all, mask_all), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            total, logs = m2f_total_loss(cls_all, mask_all, gt_masks, gt_labels, key)
            return total, (mut["batch_stats"], logs)

        (loss, (new_bs, logs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss, logs

    @jax.jit
    def eval_step(params, batch_stats, imgs_u8, masks):
        x = imgs_u8.astype(jnp.float32) / 255.0
        cls_all, mask_all = model.apply({"params": params, "batch_stats": batch_stats},
                                        x, train=False)
        seg = mask2former_semantic_inference(cls_all[-1], mask_all[-1],
                                             (args.imsize, args.imsize))
        return {"dice": 1.0 - dc_loss(seg, masks), "acc1": pixel_accuracy(seg, masks)}

    state = {"params": params, "batch_stats": batch_stats, "opt_state": opt_state,
             "epoch": 0}
    restored = restore_checkpoint(args.output_dir, state, name="m2f_checkpoint")
    if restored is not None:
        state = restored
        params, batch_stats, opt_state = state["params"], state["batch_stats"], state["opt_state"]
        print(f"resumed from epoch {state['epoch']}")

    for epoch in range(int(state["epoch"]), args.epochs):
        sampler.set_epoch(epoch)
        logger = MetricLogger()
        for imgs, masks, _ in logger.log_every(loader, 10, f"Epoch: [{epoch}]"):
            rng, k = jax.random.split(rng)
            params, batch_stats, opt_state, loss, logs = train_step(
                params, batch_stats, opt_state, jnp.asarray(imgs), jnp.asarray(masks), k)
            logger.update(loss=float(loss), **{k2: float(v) for k2, v in logs.items()})
        val = MetricLogger()
        for imgs, masks, _ in val_loader:
            m = eval_step(params, batch_stats, jnp.asarray(imgs), jnp.asarray(masks))
            val.update(**{k2: float(v) for k2, v in m.items()})
        print(f"epoch {epoch} train: {logger}  val: {val}")
        with (Path(args.output_dir) / "log.txt").open("a") as f:
            f.write(json.dumps({"epoch": epoch,
                                **{f"train_{k2}": m.global_avg for k2, m in logger.meters.items()},
                                **{f"val_{k2}": m.global_avg for k2, m in val.meters.items()}}) + "\n")
        state = {"params": params, "batch_stats": batch_stats, "opt_state": opt_state,
                 "epoch": epoch + 1}
        save_checkpoint(args.output_dir, jax.device_get(state), name="m2f_checkpoint")


if __name__ == "__main__":
    a = get_args_parser().parse_args()
    os.makedirs(a.output_dir, exist_ok=True)
    main(a)
