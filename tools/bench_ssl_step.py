#!/usr/bin/env python
"""On-chip throughput of the SSL (DINO/iBOT) multicrop train step (VERDICT r4
#8: the perf story covered only the segmentor path; this pins a number for the
pretraining stack too).

Measures the full jitted SSLMetaArch.train_step — multicrop packed forward
(2 global + 8 local crops ride ONE attention call per block via segment ids,
the BlockDiagonalMask equivalent), DINO + iBOT + KoLeo losses, EMA teacher +
center updates, AdamW — at the reference pretrain defaults (ViT-S/14,
global 224, local 98, dinov2/configs/ssl_default_config.yaml;
/root/reference/dinov2/train/train.py:134-275).

Prints one JSON line {img_s_chip, ms_step, batch}. img/s counts SOURCE images
(each contributes 2 global + 8 local crops).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import os  # noqa: E402

ARCH = os.environ.get("ASN_SSL_ARCH", "vit_small")
BATCH = int(os.environ.get("ASN_SSL_BATCH", "32"))
GLOBAL, LOCAL, N_LOCAL = 224, 98, 8
STEPS, REPEATS = 10, 3

_ARCH_DIMS = {"vit_small": (384, 12), "vit_base": (768, 12),
              "vit_large": (1024, 24)}


def ssl_step_flops(batch: int, arch: str, upperbound: int) -> float:
    """Analytic matmul/conv FLOPs of one SSL train step (2·MACs), conservative
    like bench.py's segmentor MFU: student fwd+bwd (×3 fwd cost), teacher fwd,
    DINO/iBOT heads on cls + GATHERED masked tokens, patch-embed convs;
    attention scores/outputs counted at own-segment length (pad rows and the
    segment-masked cross terms the flash kernel still computes are excluded)."""
    E, depth = _ARCH_DIMS[arch]
    tg = (GLOBAL // 14) ** 2 + 1                   # 257 tokens per global crop
    tl = (LOCAL // 14) ** 2 + 1                    # 50 per local crop
    crops = [(2 * batch, tg), (N_LOCAL * batch, tl)]
    mac_bb = 0.0
    for n, t in crops:
        per_tok = depth * (12 * E * E + 2 * t * E) + 3 * 14 * 14 * E
        mac_bb += n * t * per_tok
    # head MACs/token: 3-layer MLP + weight-normed last layer
    mac_head_tok = E * 2048 + 2048 * 2048 + 2048 * 256 + 256 * 65536
    s_head_tokens = (2 + N_LOCAL) * batch + upperbound
    t_head_tokens = 2 * batch + upperbound
    mac = (3 * mac_bb                              # student fwd + bwd(2×)
           + 3 * s_head_tokens * mac_head_tok
           + (2 * batch) * tg * (depth * (12 * E * E + 2 * tg * E)
                                 + 3 * 14 * 14 * E)  # teacher fwd, globals
           + t_head_tokens * mac_head_tok)
    return 2.0 * mac


def main():
    from adaptersis_tpu.models import build_backbone
    from adaptersis_tpu.parallel.mesh import get_mesh
    from adaptersis_tpu.ssl import (MaskingGenerator, SSLConfig, SSLMetaArch,
                                    collate_masks_with_indices)
    from adaptersis_tpu.ssl.augment import multicrop_augment
    from adaptersis_tpu.train.schedules import cosine_scheduler

    print(f"devices: {jax.devices()}", file=sys.stderr)
    # bf16 backbone + packed-crop flash attention: the TPU-shipping config
    # (pretrain.py's CPU-smoke default is fp32/einsum; heads stay fp32)
    backbone = build_backbone(ARCH, img_size=GLOBAL, patch_size=14,
                              attn_impl="flash", dtype=jnp.bfloat16)
    cfg = SSLConfig(n_local_crops=N_LOCAL, lr=1e-3)
    arch = SSLMetaArch(backbone, cfg, mesh=get_mesh(fsdp=1))
    schedules = {  # pretrain.py:106-123 shapes; values irrelevant to timing
        "lr": cosine_scheduler(1e-3, 1e-6, 1, 1000),
        "wd": cosine_scheduler(0.04, 0.4, 1, 1000),
        "momentum": cosine_scheduler(0.992, 1.0, 1, 1000),
        "teacher_temp": np.full(1000, 0.07),
        "last_layer_lr": cosine_scheduler(1e-3, 1e-6, 1, 1000),
    }

    rng = jax.random.PRNGKey(0)
    state = arch.init_state(rng, GLOBAL, LOCAL)
    n_tokens = (GLOBAL // 14) ** 2
    mask_gen = MaskingGenerator((GLOBAL // 14,) * 2,
                                num_masking_patches=n_tokens // 2)

    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (BATCH, GLOBAL + 32, GLOBAL + 32, 3), np.uint8))
    imgs = jax.device_put(imgs)
    g, l = multicrop_augment(imgs, jax.random.PRNGKey(1),
                             global_size=GLOBAL, local_size=LOCAL,
                             n_local=N_LOCAL)
    masks = collate_masks_with_indices(g.shape[0], n_tokens, mask_gen, seed=7)
    masks = jax.tree_util.tree_map(jnp.asarray, masks)
    g, l, masks = jax.device_put((g, l, masks))

    for _ in range(2):  # compile + allocator warmup
        state, metrics = arch.train_step(state, g, l, masks, schedules, 0)
        float(metrics["total_loss"])

    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = arch.train_step(state, g, l, masks, schedules, i)
        float(metrics["total_loss"])
        dt = time.perf_counter() - t0
        rates.append(BATCH * STEPS / dt)
    img_s = sorted(rates)[len(rates) // 2]
    mfu = (ssl_step_flops(BATCH, ARCH, int(masks.indices.shape[0]))
           * (img_s / BATCH) / 197e12)
    print(json.dumps({
        "metric": f"{ARCH}_dino_ibot_multicrop_train_images_per_sec_per_chip",
        "value": round(img_s, 2), "unit": "img/s/chip",
        "ms_step": round(1000 * BATCH / img_s, 1), "batch": BATCH,
        "spread": [round(min(rates), 2), round(max(rates), 2)],
        "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
