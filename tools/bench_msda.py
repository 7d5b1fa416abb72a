#!/usr/bin/env python
"""Microbenchmark: deformable-attention op at the flagship ViT-L@588 shapes.

Times fwd and fwd+bwd per call for both adapter directions:
  CAViT: 1764 ViT-token queries over the 3-level CNN pyramid (73/36/18)
  CACNN: 6949 CNN-token queries over the single-level ViT grid (42x42)

Usage: python tools/bench_msda.py [--impl matmul|gather] [--batch 12] [--dtype bf16]
TPU timing gotcha: block_until_ready returns early over the tunnel — measure
with a host transfer per step (CLAUDE.md).
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="matmul", choices=["matmul", "gather"])
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp
    import numpy as np

    from adaptersis_tpu.ops.ms_deform_attn import ms_deform_attn_core
    from adaptersis_tpu.ops.msda_matmul import msda_matmul

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, M, D, P = args.batch, 8, 128, 4
    cases = {
        "cavit": (1764, [(73, 73), (36, 36), (18, 18)]),
        "cacnn": (6949, [(42, 42)]),
    }
    rng = np.random.default_rng(0)

    for name, (Lq, shapes) in cases.items():
        L = len(shapes)
        S = sum(h * w for h, w in shapes)
        v = jnp.asarray(rng.standard_normal((B, S, M, D)), dtype)
        loc = jnp.asarray(rng.uniform(-0.05, 1.05, (B, Lq, M, L, P, 2)), jnp.float32)
        aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), jnp.float32)

        if args.impl == "matmul":
            op = lambda v_, l_, w_: msda_matmul(v_, l_, w_, tuple(map(tuple, shapes)))
        else:
            op = lambda v_, l_, w_: ms_deform_attn_core(v_, shapes, l_, w_, force_fp32=False)

        fwd = jax.jit(op)
        loss = jax.jit(jax.grad(
            lambda v_, l_, w_: op(v_, l_, w_).astype(jnp.float32).sum(),
            argnums=(0, 1, 2)))

        def timeit(fn, *a):
            o = fn(*a)
            first = jax.tree.leaves(o)[0]
            float(first.sum())  # force + sync through the tunnel
            t0 = time.perf_counter()
            for _ in range(args.steps):
                o = fn(*a)
            float(jax.tree.leaves(o)[0].sum())
            return (time.perf_counter() - t0) / args.steps * 1e3

        t_f = timeit(fwd, v, loc, aw)
        t_fb = timeit(loss, v, loc, aw)
        print(f"{name}: impl={args.impl} bs={B} {args.dtype}  "
              f"fwd {t_f:.1f} ms   fwd+bwd {t_fb:.1f} ms")


if __name__ == "__main__":
    main()
