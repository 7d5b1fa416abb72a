#!/usr/bin/env python
"""Frozen-feature evaluation CLI — the dinov2 eval entry points
(reference: dinov2/eval/linear.py, knn.py, log_regression.py mains).

  python evals_cli.py linear --arch vit_small --pretrained_weights ... --data_path ...
  python evals_cli.py knn    --arch ... --nb_knn 10 20 100 200
  python evals_cli.py logreg --arch ...

Each extracts frozen features with ModelWithIntermediateLayers and runs the
corresponding harness; --synthetic evaluates on the deterministic synthetic set.
"""

from __future__ import annotations

import argparse
import os


def get_args_parser():
    p = argparse.ArgumentParser("dinov2-evals")
    p.add_argument("mode", choices=["linear", "knn", "logreg"])
    p.add_argument("--arch", default="vit_small")
    p.add_argument("--patch_size", default=14, type=int)
    p.add_argument("--imsize", default=56, type=int)
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--checkpoint_key", default="teacher", type=str)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--dataset", default="imagefolder", type=str)
    p.add_argument("--n_last_blocks", default=4, type=int)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--num_classes", default=2, type=int)
    p.add_argument("--nb_knn", default=[10, 20, 100, 200], nargs="+", type=int)
    p.add_argument("--temperature", default=0.07, type=float)
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

    from adaptersis_tpu.data import DataLoader, SyntheticSeg
    from adaptersis_tpu.data.loaders import make_dataset
    from adaptersis_tpu.evals import (LinearProbeGrid, ModelWithIntermediateLayers,
                                      extract_features, logreg_sweep)
    from adaptersis_tpu.evals.knn import eval_knn
    from adaptersis_tpu.hub import build_model_for_eval

    model, params = build_model_for_eval(
        args.arch, args.pretrained_weights or None, args.checkpoint_key,
        patch_size=args.patch_size)
    if params is None:
        x0 = jnp.zeros((1, args.imsize, args.imsize, 3))
        params = model.init(jax.random.PRNGKey(args.seed), x0)
        print("(random backbone weights — pass --pretrained_weights for real evals)")
    fm = ModelWithIntermediateLayers(model, params, args.n_last_blocks)

    def loader(split):
        if args.synthetic:
            ds = SyntheticSeg(n=4 * args.batch_size, imsize=args.imsize,
                              seed=args.seed + (split == "val"))
            # classification target = 'does the image contain class 1'
            class Wrapped:
                def __len__(self):
                    return len(ds)
                def __getitem__(self, i):
                    img, mask, idx = ds[i]
                    return img, int((mask == 1).any()), idx
            return DataLoader(Wrapped(), batch_size=args.batch_size, num_workers=4)
        ds = make_dataset(f"{args.dataset}:split={split}:root={args.data_path}",
                          imsize=args.imsize)
        return DataLoader(ds, batch_size=args.batch_size, num_workers=8)

    train_f, train_y = extract_features(fm, loader("train"))
    val_f, val_y = extract_features(fm, loader("val"))
    n_classes = int(max(train_y.max(), val_y.max())) + 1

    if args.mode == "knn":
        accs = eval_knn(train_f, train_y, val_f, val_y, num_classes=n_classes,
                        nb_knn=tuple(args.nb_knn), T=args.temperature)
        for k, a in accs.items():
            print(f"{k}-NN accuracy: {a * 100:.2f}%")
    elif args.mode == "logreg":
        best, accs = logreg_sweep(train_f, train_y, val_f, val_y, num_classes=n_classes)
        print({f"C={c:g}": f"{a*100:.2f}%" for c, a in accs.items()})
        print(f"best C={best:g}: {accs[best] * 100:.2f}%")
    else:  # linear probe grid over tap features
        grid = LinearProbeGrid(embed_dim=model.embed_dim,
                               n_last_blocks=args.n_last_blocks,
                               num_classes=n_classes)
        grid.init(jax.random.PRNGKey(args.seed))
        tl = loader("train")
        for epoch in range(args.epochs):
            for imgs, ys, _ in tl:
                taps = fm(jnp.asarray(imgs, jnp.float32) / 255.0)
                grid.train_step(taps, jnp.asarray(np.asarray(ys)))
        vl = loader("val")
        taps_b, ys_b = [], []
        for imgs, ys, _ in vl:
            taps_b.append(fm(jnp.asarray(imgs, jnp.float32) / 255.0))
            ys_b.append(np.asarray(ys))
        best, accs = grid.evaluate(taps_b, ys_b)
        print(f"best classifier: {best} acc={accs[best] * 100:.2f}%")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
