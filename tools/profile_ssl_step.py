#!/usr/bin/env python
"""Profile the SSL (DINO/iBOT) multicrop train step and print the top ops by
device self-time — the pretraining-stack analog of tools/profile_step.py.
Runs tools/bench_ssl_step.py's exact configuration for 3 traced steps.
"""
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

ARCH = os.environ.get("ASN_SSL_ARCH", "vit_small")
BATCH = int(os.environ.get("ASN_SSL_BATCH", "32"))
GLOBAL, LOCAL, N_LOCAL = 224, 98, 8


def main():
    from adaptersis_tpu.models import build_backbone
    from adaptersis_tpu.parallel.mesh import get_mesh
    from adaptersis_tpu.ssl import (MaskingGenerator, SSLConfig, SSLMetaArch,
                                    collate_masks_with_indices)
    from adaptersis_tpu.ssl.augment import multicrop_augment
    from adaptersis_tpu.train.schedules import cosine_scheduler

    backbone = build_backbone(ARCH, img_size=GLOBAL, patch_size=14,
                              attn_impl=os.environ.get("ASN_ATTN", "flash"),
                              dtype=jnp.bfloat16)
    cfg = SSLConfig(n_local_crops=N_LOCAL, lr=1e-3)
    arch = SSLMetaArch(backbone, cfg, mesh=get_mesh(fsdp=1))
    schedules = {
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
    imgs = jax.device_put(jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (BATCH, GLOBAL + 32, GLOBAL + 32, 3), np.uint8)))
    g, l = multicrop_augment(imgs, jax.random.PRNGKey(1),
                             global_size=GLOBAL, local_size=LOCAL,
                             n_local=N_LOCAL)
    masks = collate_masks_with_indices(g.shape[0], n_tokens, mask_gen, seed=7)
    masks = jax.tree_util.tree_map(jnp.asarray, masks)
    g, l, masks = jax.device_put((g, l, masks))

    for i in range(2):
        state, metrics = arch.train_step(state, g, l, masks, schedules, i)
        float(metrics["total_loss"])

    trace_dir = "/tmp/asn_ssl_trace"
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            state, metrics = arch.train_step(state, g, l, masks, schedules, i)
        float(metrics["total_loss"])

    from _xplane import print_top_ops

    print_top_ops(trace_dir, n_steps=3, top=45)


if __name__ == "__main__":
    main()
