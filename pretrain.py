#!/usr/bin/env python
"""DINOv2 SSL pretraining CLI — the `python -m dinov2.train.train` equivalent
(reference: dinov2/train/train.py:134-318 do_train).

AdamW with layerwise lr decay + 5 cosine schedules (lr / wd / teacher momentum /
teacher temp / last-layer lr, :65-110), EMA teacher, DINO+iBOT+KoLeo losses, NaN
abort (:273-275), periodic orbax checkpoints. Data: any image folder or the
synthetic dataset; multi-crop augmentation runs on device.
"""

from __future__ import annotations

import argparse
import math
import os


def get_args_parser():
    p = argparse.ArgumentParser("dinov2-ssl-pretrain")
    p.add_argument("--arch", default="vit_small")
    p.add_argument("--patch_size", default=14, type=int)
    p.add_argument("--global_crops_size", default=224, type=int)
    p.add_argument("--local_crops_size", default=98, type=int)
    p.add_argument("--local_crops_number", default=8, type=int)
    p.add_argument("--batch_size_per_gpu", default=32, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--lr", default=4e-3, type=float)
    p.add_argument("--weight_decay", default=0.04, type=float)
    p.add_argument("--weight_decay_end", default=0.4, type=float)
    p.add_argument("--teacher_temp", default=0.07, type=float)
    p.add_argument("--warmup_teacher_temp", default=0.04, type=float)
    p.add_argument("--warmup_teacher_temp_epochs", default=30, type=int)
    p.add_argument("--momentum_teacher", default=0.992, type=float)
    p.add_argument("--freeze_last_layer_epochs", default=1, type=int)
    p.add_argument("--dino_out_dim", default=65536, type=int)
    p.add_argument("--koleo_loss_weight", default=0.1, type=float)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--output_dir", default=".", type=str)
    p.add_argument("--saveckp_freq", default=20, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", default=None, type=str)
    p.add_argument("--fsdp", default=1, type=int,
                   help="fsdp mesh-axis size: shard student/teacher/optimizer "
                        "params over this many devices (reference FULL_SHARD, "
                        "dinov2/fsdp/__init__.py:22-54); 1 = pure data parallel")
    p.add_argument("--official_epoch_length", default=1250, type=int,
                   help="iterations per 'epoch' — schedules and checkpoints are "
                        "iteration-keyed (dinov2/configs/ssl_default_config.yaml:68, "
                        "dinov2/train/train.py:66-110)")
    p.add_argument("--scaling_rule", default="sqrt_wrt_1024",
                   choices=["sqrt_wrt_1024", "none"],
                   help="lr *= sqrt(global_batch/1024) "
                        "(dinov2/utils/config.py:21-29)")
    p.add_argument("--steps_per_epoch", default=0, type=int,
                   help="override official_epoch_length (smoke tests)")
    return p


def main(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compilation cache: first compiles of the big jitted programs
    # go through this image's remote-compile tunnel (minutes); cache them
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from adaptersis_tpu.data import DataLoader, ShardedInfiniteSampler, SyntheticSeg
    from adaptersis_tpu.models.vit import build_backbone
    from adaptersis_tpu.ssl import (MaskingGenerator, SSLConfig, SSLMetaArch,
                               collate_masks_with_indices)
    from adaptersis_tpu.ssl.augment import multicrop_augment
    from adaptersis_tpu.train import (PeriodicCheckpointer, restore_checkpoint,
                                      save_checkpoint)
    from adaptersis_tpu.train.schedules import cosine_scheduler
    from adaptersis_tpu.utils import MetricLogger

    # sqrt-batch lr scaling (dinov2/utils/config.py:21-29): the reference always
    # applies it before building schedules
    global_batch = args.batch_size_per_gpu * jax.device_count()
    if args.scaling_rule == "sqrt_wrt_1024":
        base_lr = args.lr
        args.lr = base_lr * math.sqrt(global_batch / 1024.0)
        print(f"sqrt scaling learning rate; base: {base_lr}, new: {args.lr}")

    backbone = build_backbone(args.arch, img_size=args.global_crops_size,
                              patch_size=args.patch_size)
    cfg = SSLConfig(dino_out_dim=args.dino_out_dim, ibot_out_dim=args.dino_out_dim,
                    n_local_crops=args.local_crops_number, lr=args.lr,
                    weight_decay=args.weight_decay,
                    koleo_loss_weight=args.koleo_loss_weight)
    from adaptersis_tpu.parallel.mesh import get_mesh
    arch = SSLMetaArch(backbone, cfg, mesh=get_mesh(fsdp=args.fsdp))

    ds = SyntheticSeg(n=max(global_batch * 4, 64),
                      imsize=args.global_crops_size + 32, seed=args.seed)
    niter_per_ep = args.steps_per_epoch or args.official_epoch_length
    total = args.epochs * niter_per_ep

    schedules = {
        "lr": cosine_scheduler(args.lr, 1e-6, args.epochs, niter_per_ep,
                               warmup_epochs=args.warmup_epochs),
        "wd": cosine_scheduler(args.weight_decay, args.weight_decay_end,
                               args.epochs, niter_per_ep),
        "momentum": cosine_scheduler(args.momentum_teacher, 1.0, args.epochs, niter_per_ep),
        "teacher_temp": np.concatenate([
            np.linspace(args.warmup_teacher_temp, args.teacher_temp,
                        min(args.warmup_teacher_temp_epochs, args.epochs) * niter_per_ep),
            np.full(max(total - min(args.warmup_teacher_temp_epochs, args.epochs)
                        * niter_per_ep, 0), args.teacher_temp),
        ]),
        "last_layer_lr": cosine_scheduler(
            args.lr, 1e-6, args.epochs, niter_per_ep,
            warmup_epochs=args.warmup_epochs,
            freeze_iters=args.freeze_last_layer_epochs * niter_per_ep),
    }

    rng = jax.random.PRNGKey(args.seed)
    state = arch.init_state(rng, args.global_crops_size, args.local_crops_size)
    n_tokens = (args.global_crops_size // args.patch_size) ** 2
    mask_gen = MaskingGenerator(
        (args.global_crops_size // args.patch_size,) * 2,
        num_masking_patches=n_tokens // 2,
    )

    logger = MetricLogger()
    # iteration-keyed keep-last-3 retention + model_final + last_checkpoint tag
    # (reference: fvcore PeriodicCheckpointer, dinov2/train/train.py:158-162)
    periodic = PeriodicCheckpointer(args.output_dir,
                                    period=args.saveckp_freq * niter_per_ep,
                                    max_iter=total, max_to_keep=3)

    # ---- preemption resume (reference: FSDPCheckpointer.resume_or_load via the
    # last_checkpoint tag, dinov2/fsdp/__init__.py:118-141; submitit requeue
    # re-runs this main with the same output_dir, run/submit.py:92-123).
    # Everything step-dependent is derived FROM the restored step so the
    # continued run is step-for-step identical to an uninterrupted one:
    # per-iteration rng = fold_in(seed, it), mask seed = f(it), sampler
    # advanced by it·global_batch samples (ShardedInfiniteSampler.advance).
    it = 0
    last = periodic.get_checkpoint_file()
    if last:
        restored = restore_checkpoint(args.output_dir, jax.device_get(state),
                                      name=os.path.basename(last))
        if restored is not None:
            state = arch.shard_state(restored)
            it = int(state["step"])
            print(f"resumed from {last} at iteration {it}")

    # resumable infinite sampler + iteration-keyed loop over
    # epochs × OFFICIAL_EPOCH_LENGTH (dinov2/train/train.py:134-318)
    sampler = ShardedInfiniteSampler(len(ds), seed=args.seed,
                                     rank=jax.process_index(),
                                     world_size=jax.process_count(),
                                     advance=it * global_batch)
    loader = DataLoader(ds, sampler=sampler, batch_size=global_batch,
                        num_workers=4)

    data_iter = iter(loader)
    while it < total:
        imgs, _, _ = next(data_iter)
        ka = jax.random.fold_in(rng, it)
        g, l = multicrop_augment(jnp.asarray(imgs), ka,
                                 global_size=args.global_crops_size,
                                 local_size=args.local_crops_size,
                                 n_local=args.local_crops_number)
        # gathered-token mask plumbing: the 65536-wide iBOT heads run on the
        # masked rows only (reference ssl_meta_arch.py:169-181, 252-260)
        masks = collate_masks_with_indices(g.shape[0], n_tokens, mask_gen,
                                           seed=args.seed * 100000 + it)
        masks = jax.tree_util.tree_map(jnp.asarray, masks)
        state, metrics = arch.train_step(state, g, l, masks,
                                         schedules, min(it, total - 1))
        loss = float(metrics["total_loss"])
        if math.isnan(loss):
            raise RuntimeError(f"NaN loss at iteration {it}")  # train.py:273-275
        logger.update(**{k: float(v) for k, v in metrics.items()})
        it += 1
        # only materialize the (multi-GB at ViT scale) state on host when
        # this iteration actually saves — device_get is a full transfer+sync.
        # The FULL state (incl. optimizer moments + centers) is saved so a
        # requeued run continues bit-identically (§5 'requeue≡resume').
        if it % periodic.period == 0 or it >= total:
            periodic.step(it - 1, jax.device_get(state))
        if it % niter_per_ep == 0:
            print(f"epoch {it // niter_per_ep - 1}: {logger}")
        preempt_at = int(os.environ.get("ASN_PREEMPT_AT", "0"))
        if preempt_at and it >= preempt_at:
            # simulated mid-training preemption (test hook): exits WITHOUT
            # saving — the requeued run must resume from the last periodic
            # checkpoint and replay to a bit-identical trajectory
            print(f"preempted at iteration {it}")
            return


if __name__ == "__main__":
    a = get_args_parser().parse_args()
    os.makedirs(a.output_dir, exist_ok=True)
    main(a)
