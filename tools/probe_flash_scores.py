#!/usr/bin/env python
"""Measure the attention-score bound behind flash_fwd's clamp-softmax
(VERDICT r4 weak #2 / next-round #4).

`ops/flash_fwd.py` replaces the row-max subtraction of online softmax (the
reference's xformers path, /root/reference/dinov2/layers/attention.py:72-89)
with a constant clamp `_CLAMP=60`: the result is EXACTLY softmax whenever every
valid score < 60. The safety claim was "empirically |S| ≲ 30" — this tool turns
that into a committed measurement:

  1. builds the exact shipping trainer (ViT-L/14 @588, bf16, pallas defaults)
     and records max|S| at RANDOM INIT,
  2. trains ~50 steps (synthetic batch, the bench recipe), and records max|S|
     again on the trained weights — the adapter stream feeds trained
     activations back through frozen blocks, so late-walk scores can move,
  3. asserts a ≥2x margin below _CLAMP in both cases.

The probe itself runs the same forward with attn_impl="einsum" + a score sow
(models/layers.PROBE_ATTN_SCORES): identical weights, activations within
O(1e-2) of the pallas path — more than enough resolution against a 2x margin.
All 48 walk applications (24 clean + 21 adapter prefix + 3 re-walk singles)
are covered; max over batch and heads.

Caveat (documented, environment-bound): no real pretrained DINOv2 weights
exist in this environment, so the measurement covers random init + short
training, not a converged production checkpoint. Run once per round on the
chip; output committed as VERIFY_FLASH_CLAMP.md.
"""
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

from adaptersis_tpu.data.augment import train_augment  # noqa: E402
from adaptersis_tpu.models import AdapterSegmentor, build_backbone  # noqa: E402
from adaptersis_tpu.models import layers as layers_mod  # noqa: E402
from adaptersis_tpu.ops.flash_fwd import _CLAMP  # noqa: E402
from adaptersis_tpu.parallel.mesh import get_mesh  # noqa: E402
from adaptersis_tpu.train import Trainer, TrainerConfig  # noqa: E402

IMSIZE = 588
ARCH = "vit_large"
TRAIN_BATCH = 16
PROBE_BATCH = 8   # score magnitude is per-row; batch only adds samples
STEPS = int(os.environ.get("ASN_PROBE_STEPS", "50"))
MARGIN = 2.0


def build_probe_fn():
    """Einsum-attention twin of the shipping model, scores sown."""
    layers_mod.PROBE_ATTN_SCORES = True
    backbone = build_backbone(ARCH, img_size=518, patch_size=14,
                              attn_impl="einsum", gelu_approx=True,
                              dtype=jnp.bfloat16)
    model = AdapterSegmentor(backbone=backbone, num_classes=2, n_last_blocks=4,
                             msda_impl="gather", dtype=jnp.bfloat16)

    def probe(params, frozen, batch_stats, images_u8, masks, rng):
        aug_imgs, _ = train_augment(images_u8, masks, rng, use_clahe=True)
        variables = {"params": {**params, **frozen},
                     "batch_stats": batch_stats}
        _, mut = model.apply(variables, aug_imgs, train=True,
                             mutable=["batch_stats", "intermediates"])
        scores = [jnp.max(jnp.stack(v)) for v in jax.tree_util.tree_leaves(
            mut["intermediates"], is_leaf=lambda x: isinstance(x, tuple))]
        n_calls = sum(
            len(v) for v in jax.tree_util.tree_leaves(
                mut["intermediates"], is_leaf=lambda x: isinstance(x, tuple)))
        return jnp.max(jnp.stack(scores)), n_calls

    return jax.jit(probe, static_argnames=())


def main():
    print(f"devices: {jax.devices()}")
    backbone = build_backbone(ARCH, img_size=518, patch_size=14,
                              attn_impl="flash_fwd", gelu_approx=True,
                              mlp_impl="pallas", qkv_impl="pallas",
                              dtype=jnp.bfloat16)
    model = AdapterSegmentor(backbone=backbone, num_classes=2, n_last_blocks=4,
                             msda_impl="pallas", dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainerConfig(loss="dc", use_clahe=True),
                      mesh=get_mesh(fsdp=1))

    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (TRAIN_BATCH, IMSIZE, IMSIZE, 3), np.uint8)))
    masks = jax.device_put(jnp.asarray(
        (rng.uniform(size=(TRAIN_BATCH, IMSIZE, IMSIZE)) > 0.8)
        .astype(np.int32)))
    state = trainer.init_state((imgs, masks))

    probe = build_probe_fn()
    key = jax.random.PRNGKey(3)

    def run_probe(state, tag):
        t0 = time.time()
        m, n_calls = probe(state["params"], state["frozen"],
                           state["batch_stats"],
                           imgs[:PROBE_BATCH], masks[:PROBE_BATCH], key)
        m = float(m)
        print(f"  {tag}: max|S| = {m:.3f} over {n_calls} attention calls "
              f"({time.time()-t0:.0f}s)", flush=True)
        return m, n_calls

    rows = []
    m0, n_calls = run_probe(state, "random init")
    rows.append(("random init", m0))

    tkey = jax.random.PRNGKey(0)
    t0 = time.time()
    for step in range(STEPS):
        tkey, k = jax.random.split(tkey)
        state, loss = trainer.train_step(state, imgs, masks, k, epoch=0)
    print(f"  trained {STEPS} steps (loss {float(loss):.4f}, "
          f"{time.time()-t0:.0f}s)", flush=True)
    m1, _ = run_probe(state, f"after {STEPS} steps")
    rows.append((f"after {STEPS} train steps", m1))

    ok = all(m * MARGIN <= _CLAMP for _, m in rows)
    lines = ["| weights | max|S| over all walk attention calls | "
             f"bound (_CLAMP/{MARGIN:.0f}) | verdict |",
             "|---|---|---|---|"]
    for tag, m in rows:
        lines.append(f"| {tag} | {m:.3f} | {_CLAMP / MARGIN:.0f} | "
                     f"{'PASS' if m * MARGIN <= _CLAMP else 'FAIL'} |")
    dev = str(jax.devices()[0])
    lines.append(
        f"\nViT-L/14@588 shipping step, {n_calls} walk attention "
        f"applications, bs{PROBE_BATCH} probe / bs{TRAIN_BATCH} training, "
        f"on-chip ({dev}). flash_fwd is exactly softmax while every valid "
        f"score < _CLAMP={_CLAMP:.0f}; the assert demands a {MARGIN:.0f}x "
        "margin. Probe path: einsum attention with a score sow "
        "(models/layers.PROBE_ATTN_SCORES) on the same weights — activations "
        "within O(1e-2) of the pallas path, ample against this margin. "
        "Environment-bound caveat: measured at random init + short synthetic "
        "training (no pretrained DINOv2 checkpoint exists here).")
    text = "\n".join(lines)
    print(text)
    Path(__file__).resolve().parent.parent.joinpath(
        "VERIFY_FLASH_CLAMP.md").write_text(text + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
