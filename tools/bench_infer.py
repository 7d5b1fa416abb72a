#!/usr/bin/env python
"""Segmentor INFERENCE throughput (images/sec/chip) — the serving-side number
next to bench.py's train step: ViT-L/14@588 AdapterSegmentor forward + argmax
mask, bf16, pallas MSDA fwd, frozen-walk fast kernels (the deployed
configuration; reference inference surface: train.py --evaluate /
eval/eval_dinov2_*.py). Prints one JSON line."""
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

ARCH = os.environ.get("ASN_ARCH", "vit_large")
BATCH = int(os.environ.get("ASN_BATCH", "16"))
IMSIZE = int(os.environ.get("ASN_IMSIZE", "588"))
STEPS, REPEATS = 10, 3


def main():
    from adaptersis_tpu.models import AdapterSegmentor, build_backbone

    print(f"devices: {jax.devices()}", file=sys.stderr)
    backbone = build_backbone(ARCH, img_size=518, patch_size=14,
                              attn_impl=os.environ.get("ASN_ATTN", "flash_fwd"),
                              gelu_approx=True,
                              mlp_impl=os.environ.get("ASN_MLP", "pallas"),
                              qkv_impl=os.environ.get("ASN_QKV", "pallas"),
                              dtype=jnp.bfloat16)
    model = AdapterSegmentor(backbone=backbone, num_classes=2, n_last_blocks=4,
                             msda_impl="pallas", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (BATCH, IMSIZE, IMSIZE, 3), np.uint8)))
    x0 = jnp.zeros((1, IMSIZE, IMSIZE, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    @jax.jit
    def infer(variables, imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        logits = model.apply(variables, x, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    for _ in range(2):
        m = infer(variables, imgs)
        int(m[0, 0, 0])

    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            m = infer(variables, imgs)
        int(m[0, 0, 0])
        dt = time.perf_counter() - t0
        rates.append(BATCH * STEPS / dt)
    img_s = sorted(rates)[len(rates) // 2]
    print(json.dumps({
        "metric": f"{ARCH}_{IMSIZE}_adapter_inference_images_per_sec_per_chip",
        "value": round(img_s, 2), "unit": "img/s/chip",
        "ms_batch": round(1000 * BATCH / img_s, 1), "batch": BATCH,
        "spread": [round(min(rates), 2), round(max(rates), 2)],
    }))


if __name__ == "__main__":
    main()
