#!/usr/bin/env python
"""Profile the ViT-Adapter + Mask2Former train step (tools/bench_m2f_step.py
config) and print top ops by device self-time."""
import collections
import os
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402

ARCH = os.environ.get("ASN_M2F_ARCH", "vit_large")
BATCH = int(os.environ.get("ASN_M2F_BATCH", "4"))
IMSIZE = int(os.environ.get("ASN_M2F_IMSIZE", "518"))
NUM_CLASSES = 2
MSDA_IMPL = os.environ.get("ASN_M2F_MSDA", "pallas")


def main():
    import optax
    from flax import linen as nn

    from adaptersis_tpu.models.m2f_loss import (m2f_total_loss,
                                                semantic_to_instances)
    from adaptersis_tpu.models.mask2former import Mask2FormerHead
    from adaptersis_tpu.models.vit import build_backbone
    from adaptersis_tpu.models.vit_adapter import ViTAdapter

    backbone = build_backbone(ARCH, img_size=518, patch_size=14,
                              attn_impl=os.environ.get("ASN_ATTN", "flash_fwd"),
                              gelu_approx=True,
                              mlp_impl=os.environ.get("ASN_MLP", "pallas"),
                              qkv_impl=os.environ.get("ASN_QKV", "pallas"),
                              dtype=jnp.bfloat16)

    class Model(nn.Module):
        backbone: object

        @nn.compact
        def __call__(self, x, train: bool = False):
            feats = ViTAdapter(backbone=self.backbone, freeze_vit=True,
                               msda_impl=MSDA_IMPL,
                               dtype=jnp.bfloat16, name="adapter")(x, train=train)
            return Mask2FormerHead(num_classes=NUM_CLASSES, num_queries=100,
                                   feat_channels=256, num_decoder_layers=9,
                                   msda_impl=MSDA_IMPL,
                                   dtype=jnp.bfloat16, name="head")(feats, train=train)

    model = Model(backbone=backbone)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, IMSIZE, IMSIZE, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(rng, x0, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adamw(1e-4, weight_decay=0.05)
    opt_state = tx.init(params)
    sem2inst = jax.vmap(lambda m: semantic_to_instances(m, NUM_CLASSES, NUM_CLASSES))

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

        (loss, (new_bs, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    rr = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rr.integers(0, 256, (BATCH, IMSIZE, IMSIZE, 3), np.uint8)))
    masks = jax.device_put(jnp.asarray(
        (rr.uniform(size=(BATCH, IMSIZE, IMSIZE)) > 0.8).astype(np.int32)))
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, imgs, masks, k)
        float(loss)

    trace_dir = "/tmp/asn_m2f_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            key, k = jax.random.split(key)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, imgs, masks, k)
        float(loss)

    from _xplane import print_top_ops

    print_top_ops(trace_dir, n_steps=3, top=40)


if __name__ == "__main__":
    main()
