#!/usr/bin/env python
"""On-chip throughput of the ViT-Adapter + Mask2Former TRAIN step — pins a
perf number for the reference's segmentation_m2f tree (the third trainable
stack next to the adapter-segmentor and SSL steps; reference architecture
dinov2/eval/segmentation_m2f/*, trained end to end by segment_m2f.py).

Measures segment_m2f.py's exact jitted train_step: frozen DINOv2 + ViTAdapter
FPN -> Mask2FormerHead (100 queries, 9 decoder layers), Hungarian-matched
class + point-sampled mask BCE + dice over all decoder layers, AdamW.
Hungarian matching runs ON DEVICE (ops/hungarian.py LAPJV — the tunnel
backend has no host callbacks); deformable attention defaults to the Mosaic
kernel (ASN_M2F_MSDA=gather|matmul|pallas to A/B). Prints one JSON line.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

ARCH = os.environ.get("ASN_M2F_ARCH", "vit_large")
BATCH = int(os.environ.get("ASN_M2F_BATCH", "4"))
IMSIZE = int(os.environ.get("ASN_M2F_IMSIZE", "518"))
NUM_CLASSES = 2
MSDA_IMPL = os.environ.get("ASN_M2F_MSDA", "pallas")
STEPS, REPEATS = 5, 3


def main():
    # same pallas A/B knobs as bench.py
    from adaptersis_tpu.ops import msda_pallas

    msda_pallas.use_merged_bwd(os.environ.get("ASN_MERGED_MSDA", "1") != "0")
    msda_pallas.use_uform_bwd(os.environ.get("ASN_MSDA_UFORM", "1") != "0")
    msda_pallas.use_gather_bwd(os.environ.get("ASN_GATHER_BWD", "1") != "0")
    if os.environ.get("ASN_GW_FWD"):
        msda_pallas._GW_FWD = int(os.environ["ASN_GW_FWD"])
        msda_pallas._plan.cache_clear()

    import optax
    from flax import linen as nn

    from adaptersis_tpu.models.m2f_loss import (m2f_total_loss,
                                                semantic_to_instances)
    from adaptersis_tpu.models.mask2former import Mask2FormerHead
    from adaptersis_tpu.models.vit import build_backbone
    from adaptersis_tpu.models.vit_adapter import ViTAdapter

    print(f"devices: {jax.devices()}", file=sys.stderr)
    # frozen-walk fast path, same rationale as bench.py: every backbone block
    # here runs under stop_gradient (freeze_vit=True), so the fwd-only
    # clamp-softmax flash kernel and the fused LN+QKV / LN+MLP kernels apply
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
    max_seg = NUM_CLASSES
    sem2inst = jax.vmap(lambda m: semantic_to_instances(m, NUM_CLASSES, max_seg))

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

    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            key, k = jax.random.split(key)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, imgs, masks, k)
        float(loss)
        dt = time.perf_counter() - t0
        rates.append(BATCH * STEPS / dt)
    img_s = sorted(rates)[len(rates) // 2]
    print(json.dumps({
        "metric": f"{ARCH}_{IMSIZE}_vitadapter_m2f_train_images_per_sec_per_chip",
        "value": round(img_s, 2), "unit": "img/s/chip",
        "ms_step": round(1000 * BATCH / img_s, 1), "batch": BATCH,
        "spread": [round(min(rates), 2), round(max(rates), 2)],
        "msda_impl": MSDA_IMPL,
    }))


if __name__ == "__main__":
    main()
