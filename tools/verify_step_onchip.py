#!/usr/bin/env python
"""On-chip FULL-STEP numerics gate (VERDICT r4 #1).

The per-kernel gates (tests/ in interpret mode, tools/verify_msda_onchip.py on
the chip) certify each Pallas kernel in isolation; nothing certifies the
COMPOSITION the bench step actually ships — flash_fwd (clamp-softmax) +
fused_ln_qkv (ones-column v store) + fused_ln_mlp + the merged-bwd pallas MSDA,
all in one jitted train step. A Mosaic miscompile in any of them would change
training numbers silently.

This tool builds the exact bench-geometry train-step computation TWICE from the
SAME weights and the SAME augmented batch, runs BOTH on the chip, and compares
loss + the full gradient tree per trainable subtree:

  * pallas side  — bench.py defaults: attn_impl=flash_fwd, qkv/mlp pallas,
    msda_impl=pallas (merged corner-gather backward), gelu_approx.
  * XLA side     — attn_impl=einsum (fp32 softmax), qkv/mlp/ln XLA ops,
    msda_impl=gather (the reference math of ms_deform_attn_core_pytorch,
    /root/reference/backbones/ops/modules/ms_deform_attn.py:33-54; the einsum
    softmax replaces the row-max-subtracting xformers path,
    /root/reference/dinov2/layers/attention.py:72-89).

Two dtype regimes, mirroring VERIFY_MSDA_ONCHIP's bounds:

  * fp32 @ bs2 (tight): both sides fp32 end to end. The floor is NOT fp32 eps —
    the v5e MXU multiplies f32 dot operands at bf16 precision by default and
    the two sides order the same contractions differently, so the per-op floor
    (~3-6e-3 relative, measured in the MSDA gate) compounds across the 24-block
    walk + 8 adapter MSDA calls. Real miscompile classes (wrong lane, dropped
    group, off-by-one corner, clamp ruining a softmax) are O(1e-1..1).
  * bf16 @ bs16 (the exact shipping config): sanity bounds — bf16 rounding
    differs between the two compositions by construction.

Run once per round on the real chip; the table is committed as
VERIFY_STEP_ONCHIP.md. Exits 1 on any FAIL.
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
from adaptersis_tpu.losses import LOSSES  # noqa: E402
from adaptersis_tpu.models import AdapterSegmentor, build_backbone  # noqa: E402
from adaptersis_tpu.parallel.mesh import get_mesh  # noqa: E402
from adaptersis_tpu.train import Trainer, TrainerConfig  # noqa: E402

IMSIZE = int(os.environ.get("ASN_IMSIZE", "588"))
ARCH = os.environ.get("ASN_ARCH", "vit_large")

# (name, dtype, batch, loss_tol, l2_tol, max_tol). bf16 runs at bs8, not the
# bench's bs16: the all-XLA REFERENCE side materializes (B, 16, 1792, 1792)
# einsum score tensors and OOMs the 15.75 GB HBM by ~330 MB at bs16 — the
# pallas side itself fits (that is the point of the kernels). bs8 keeps the
# full geometry (588 px, 1792-token walks, identical kernel grids per batch
# element). Bound rationale: see subtree_err.
# l2 bounds = 2x the measured drift (fp32 worst 3.9e-2 / bf16 worst 7.1e-2,
# first calibrated run 2026-08-20): drift is uniform across subtrees and
# nearly dtype-independent — compounded MXU bf16-multiplicand error over the
# ~8-MSDA/48-attention chain — while any scramble-class miscompile yields
# l2dist ≈ √2 on some subtree (a permuted zero-mean vector), 15-35x above
# these bounds.
REGIMES = (
    ("fp32/bs2", jnp.float32, 2, 2e-3, 8e-2, 1.5e-1),
    ("bf16/bs8", jnp.bfloat16, 8, 1e-2, 1.5e-1, 1.5e-1),
)


def build_model(dtype, pallas: bool):
    if pallas:
        backbone = build_backbone(ARCH, img_size=518, patch_size=14,
                                  attn_impl="flash_fwd", gelu_approx=True,
                                  ln_impl="xla", mlp_impl="pallas",
                                  qkv_impl="pallas", dtype=dtype)
        msda = "pallas"
    else:
        backbone = build_backbone(ARCH, img_size=518, patch_size=14,
                                  attn_impl="einsum", gelu_approx=True,
                                  ln_impl="xla", mlp_impl="xla",
                                  qkv_impl="xla", dtype=dtype)
        msda = "gather"
    return AdapterSegmentor(backbone=backbone, num_classes=2, n_last_blocks=4,
                            msda_impl=msda, dtype=dtype)


def loss_and_grads_fn(model, loss_fn):
    def fn(params, frozen, batch_stats, images_u8, masks, rng):
        aug_imgs, aug_masks = train_augment(images_u8, masks, rng,
                                            use_clahe=True)

        def loss_of(p):
            variables = {"params": {**p, **frozen},
                         "batch_stats": batch_stats}
            logits, _ = model.apply(variables, aug_imgs, train=True,
                                    mutable=["batch_stats"])
            out = jax.nn.softmax(logits, axis=-1)
            return loss_fn(out, aug_masks)

        return jax.value_and_grad(loss_of)(params)

    return jax.jit(fn)


def perturb(tree, key, sigma=0.02):
    """Deterministic param noise shared by both sides. Why: at RANDOM INIT the
    CAViT LayerScale is zero (init_values=0.0, the reference injector init),
    which zeroes every gradient flowing through the CNN stream — the first
    gate run measured grad[cross_cnn] ≡ 0 on both sides, i.e. certified
    nothing about that path. Perturbing all params lights up every branch.
    ONE jitted program for the whole tree: per-leaf dispatch over this
    image's TPU tunnel costs ~seconds/leaf (hundreds of tiny remote
    compiles) — the first v3 gate run sat >25 min in exactly that."""

    @jax.jit
    def go(tree, key):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(key, len(leaves))
        out = []
        for k, leaf in zip(keys, leaves):
            if leaf.dtype in (jnp.float32, jnp.bfloat16) and leaf.size:
                out.append(leaf + sigma * jax.random.normal(
                    k, leaf.shape, jnp.float32).astype(leaf.dtype))
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    return go(tree, key)


def subtree_err(ga, gb):
    """(normalized L2 distance, max elementwise rel err) over the subtree.

    The DISCRIMINATING statistic is ||a−b||/||b||: precision drift (MXU
    bf16-multiplicand f32 dots, different contraction orders on the two
    sides) stays small, while any real miscompile (wrong lane/corner/group
    scramble) is O(1) even when it PRESERVES norms. max|a−b|/max|b| is
    reported against a loose bound: over a 24-block + 8-MSDA + BatchNorm
    chain its tail is precision-bound (first run measured 4.3e-2 fp32 on the
    encoder subtree while its l2-dist/norm error sat at 1e-5)."""
    la = jax.tree_util.tree_leaves(ga)
    lb = jax.tree_util.tree_leaves(gb)
    av = np.concatenate([np.asarray(x, np.float64).ravel() for x in la])
    bv = np.concatenate([np.asarray(x, np.float64).ravel() for x in lb])
    scale = max(np.abs(bv).max(), 1e-30)
    max_rel = float(np.abs(av - bv).max() / scale)
    l2_dist = float(np.linalg.norm(av - bv) / max(np.linalg.norm(bv), 1e-30))
    return l2_dist, max_rel


def run_regime(name, dtype, batch, loss_tol, l2_tol, max_tol, rows):
    print(f"== {name} ==", flush=True)
    model_p = build_model(dtype, pallas=True)
    model_x = build_model(dtype, pallas=False)
    mesh = get_mesh(fsdp=1)
    trainer = Trainer(model_p, TrainerConfig(loss="dc", use_clahe=True),
                      mesh=mesh)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, IMSIZE, IMSIZE, 3),
                                    np.uint8))
    masks = jnp.asarray((rng.uniform(size=(batch, IMSIZE, IMSIZE)) > 0.8)
                        .astype(np.int32))
    state = trainer.init_state((imgs, masks))
    state["params"] = perturb(state["params"], jax.random.PRNGKey(11))
    key = jax.random.PRNGKey(7)

    loss_fn = LOSSES["dc"]
    fp = loss_and_grads_fn(model_p, loss_fn)
    fx = loss_and_grads_fn(model_x, loss_fn)

    t0 = time.time()
    loss_p, grads_p = fp(state["params"], state["frozen"],
                         state["batch_stats"], imgs, masks, key)
    loss_p = float(loss_p)
    grads_p = jax.device_get(grads_p)
    print(f"  pallas side: loss={loss_p:.6f} ({time.time()-t0:.0f}s)",
          flush=True)
    t0 = time.time()
    loss_x, grads_x = fx(state["params"], state["frozen"],
                         state["batch_stats"], imgs, masks, key)
    loss_x = float(loss_x)
    grads_x = jax.device_get(grads_x)
    print(f"  XLA side:    loss={loss_x:.6f} ({time.time()-t0:.0f}s)",
          flush=True)

    ok = True
    e = abs(loss_p - loss_x) / max(abs(loss_x), 1e-30)
    o = e <= loss_tol
    ok &= o
    rows.append((name, "loss", e, loss_tol, o))
    for sub in sorted(grads_p):
        # a silently-dead gradient path would compare 0 ≡ 0 forever — fail
        # loudly instead (the perturbation exists to prevent exactly this)
        bnorm = float(np.linalg.norm(np.concatenate(
            [np.asarray(x, np.float64).ravel()
             for x in jax.tree_util.tree_leaves(grads_x[sub])])))
        if bnorm == 0.0:
            rows.append((name, f"grad[{sub}] DEAD PATH", float("inf"),
                         l2_tol, False))
            ok = False
            continue
        l2_dist, max_rel = subtree_err(grads_p[sub], grads_x[sub])
        o = l2_dist <= l2_tol
        ok &= o
        rows.append((name, f"grad[{sub}] l2dist", l2_dist, l2_tol, o))
        o = max_rel <= max_tol
        ok &= o
        rows.append((name, f"grad[{sub}] max", max_rel, max_tol, o))
    return ok


def main():
    print(f"devices: {jax.devices()}")
    rows, ok = [], True
    for regime in REGIMES:
        ok &= run_regime(*regime, rows)
    lines = ["| regime | quantity | rel err | bound | verdict |",
             "|---|---|---|---|---|"]
    for name, q, e, tol, o in rows:
        lines.append(f"| {name} | {q} | {e:.2e} | {tol:.0e} | "
                     f"{'PASS' if o else 'FAIL'} |")
    dev = str(jax.devices()[0])
    lines.append(
        f"\nFull train-step composition gate, on-chip ({dev}), "
        f"{ARCH}@{IMSIZE}: pallas bench defaults (flash_fwd + fused QKV/MLP + "
        "merged-bwd pallas MSDA) vs all-XLA step (einsum attention + gather "
        "MSDA), same (perturbed — every LayerScale path live) weights, same "
        "augmented batch; loss + full gradient tree per trainable subtree: "
        "normalized L2 distance (the miscompile discriminator — scrambles "
        "are O(1) even when norm-preserving) and max elementwise rel err "
        "(loose bound; precision-tailed over this chain depth). A zero "
        "XLA-side subtree gradient fails as DEAD PATH.")
    lines.append(
        "Bounds are 2x the first calibrated run's drift (fp32 worst l2dist "
        "3.9e-2, bf16 7.1e-2 — uniform across subtrees and nearly "
        "dtype-independent, i.e. compounded MXU bf16-multiplicand f32-dot "
        "error over the ~8-MSDA/48-attention chain, per-op floor ~3-6e-3 as "
        "measured in VERIFY_MSDA_ONCHIP). A scramble-class miscompile puts "
        "l2dist ≈ √2 on some subtree — 15-35x above these bounds.")
    text = "\n".join(lines)
    print(text)
    Path(__file__).resolve().parent.parent.joinpath(
        "VERIFY_STEP_ONCHIP.md").write_text(text + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
