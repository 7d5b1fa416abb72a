#!/usr/bin/env python
"""Standalone A/B of the fused Pallas LayerNorm vs flax nn.LayerNorm at the
flagship frozen-walk shape ((16·1792, 1024) bf16) on the attached TPU.

Timing caveat (CLAUDE.md): a REPS-loop amortizes the ~30 ms tunnel RPC to
~+1 ms/call — compare the two columns against each other, not against SOL.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adaptersis_tpu.ops.layernorm import fused_layernorm

REPS = int(__import__("os").environ.get("ASN_REPS", "30"))
R, C = 16 * 1792, 1024


def timeit(fn, *args):
    fn(*args)[0].block_until_ready()

    def loop(x, w, b):
        y = x
        for _ in range(REPS):
            y = fn(y, w, b)[0]
        return y

    loop_j = jax.jit(loop)
    float(loop_j(*args).sum())  # compile
    t0 = time.perf_counter()
    float(loop_j(*args).sum())
    dt = time.perf_counter() - t0
    return (dt - 0.03) / REPS * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=C).astype(np.float32))
    b = jnp.asarray(rng.normal(size=C).astype(np.float32))

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    params = {"params": {"scale": w, "bias": b}}

    def xla_ln(x, w, b):
        return (ln.apply({"params": {"scale": w, "bias": b}}, x),)

    def pallas_ln(x, w, b):
        return (fused_layernorm(x, w, b, 1e-6),)

    import os
    trs = [int(t) for t in os.environ.get("ASN_TR", "1024").split(",")]
    stats = os.environ.get("ASN_STATS", "sum").split(",")
    print(f"xla    : {timeit(xla_ln, x, w, b):7.3f} ms")
    from adaptersis_tpu.ops import layernorm as lnmod
    for tr in trs:
        for st in stats:
            lnmod._TR, lnmod._STATS = tr, st
            print(f"pallas TR={tr:5d} stats={st:4s}: "
                  f"{timeit(pallas_ln, x, w, b):7.3f} ms")


if __name__ == "__main__":
    main()
