#!/usr/bin/env python
"""Standalone A/B: fused_ln_qkv kernel vs plain-XLA LN+Dense+split/transpose
at the flagship frozen-walk shape (16×1792 tokens, C=1024, H=16, bf16)."""
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import adaptersis_tpu.ops.fused_qkv as fq  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REPS = 30


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.asarray(out[0]).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.asarray(out[0]).sum())
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    import os
    if os.environ.get("ASN_QKV_TR"):
        fq._TR = int(os.environ["ASN_QKV_TR"])
    C, H = 1024, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 1792, C)), jnp.bfloat16)
    ls = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
    lb = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.standard_normal(3 * C) * 0.01, jnp.float32)

    fused = jax.jit(lambda *a: fq.fused_ln_qkv(*a, H))
    xla = jax.jit(lambda *a: fq.reference_ln_qkv(*a, H))
    print(f"devices: {jax.devices()}  TR={fq._TR}")
    print(f"fused  {timeit(fused, x, ls, lb, w, b):6.2f} ms")
    print(f"xla    {timeit(xla, x, ls, lb, w, b):6.2f} ms")


if __name__ == "__main__":
    main()
