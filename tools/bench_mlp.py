#!/usr/bin/env python
"""Standalone A/B: fused_ln_mlp kernel vs the plain-XLA formula at the
flagship frozen-walk shape (16×1792 tokens, C=1024, H=4096, bf16)."""
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import adaptersis_tpu.ops.fused_mlp as fm  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REPS = 30


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.asarray(out).sum())
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    import os
    if os.environ.get("ASN_MLP_TR"):
        fm._TR = int(os.environ["ASN_MLP_TR"])
    C, H = 1024, 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 1792, C)), jnp.bfloat16)
    ls = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
    lb = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, H)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(H) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, C)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)
    g = jnp.full((C,), 1e-1, jnp.float32)
    args = (x, ls, lb, w1, b1, w2, b2, g)

    fused = jax.jit(fm.fused_ln_mlp)
    xla = jax.jit(fm.reference_ln_mlp)
    print(f"devices: {jax.devices()}  TR={fm._TR}")
    print(f"fused  {timeit(fused, *args):6.2f} ms")
    print(f"xla    {timeit(xla, *args):6.2f} ms")


if __name__ == "__main__":
    main()
