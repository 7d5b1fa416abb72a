#!/usr/bin/env python
"""Frozen-walk block variant experiments (follow-up to bench_block.py):
where do MLP 6.5 ms / LN 2.2 ms / attn-glue 1.4 ms go, and what wins?

All at the flagship shape: bs16, N=1765(/1792), E=1024, 16 heads, bf16, fwd.
"""
import functools
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adaptersis_tpu.models.layers import _sdpa_flash  # noqa: E402

B, N, NP, E, H = 16, 1765, 1792, 1024, 16
REPS = 20

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, E)), jnp.bfloat16)
    xp = jnp.asarray(rng.standard_normal((B, NP, E)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((E, 4 * E)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4 * E, E)) * 0.02, jnp.float32)

    def mlp(act):
        def f(x_):
            y = x_ @ w1.astype(jnp.bfloat16)
            y = act(y)
            return y @ w2.astype(jnp.bfloat16)
        return f

    print(f"mlp erf (exact)    : {timeit(jax.jit(mlp(lambda y: jax.nn.gelu(y, approximate=False))), x):6.2f} ms")
    print(f"mlp tanh (approx)  : {timeit(jax.jit(mlp(lambda y: jax.nn.gelu(y, approximate=True))), x):6.2f} ms")
    print(f"mlp sigmoid(1.702x): {timeit(jax.jit(mlp(lambda y: y * jax.nn.sigmoid(1.702 * y))), x):6.2f} ms")
    print(f"mlp relu           : {timeit(jax.jit(mlp(jax.nn.relu)), x):6.2f} ms")
    print(f"mlp erf fp32 act   : {timeit(jax.jit(mlp(lambda y: jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(jnp.bfloat16))), x):6.2f} ms")

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    p = ln.init(jax.random.PRNGKey(0), x[:1, :8])
    print(f"flax LN            : {timeit(jax.jit(lambda x_: ln.apply(p, x_)), x):6.2f} ms")

    def manual_ln(x_):
        xf = x_.astype(jnp.float32)
        m = xf.mean(-1, keepdims=True)
        d = xf - m
        v = (d * d).mean(-1, keepdims=True)
        return (d * jax.lax.rsqrt(v + 1e-6)).astype(jnp.bfloat16)

    print(f"manual LN fp32     : {timeit(jax.jit(manual_ln), x):6.2f} ms")

    def manual_ln_bf16(x_):
        m = x_.mean(-1, keepdims=True)
        d = x_ - m
        v = (d * d).mean(-1, keepdims=True)
        return d * jax.lax.rsqrt(v + jnp.bfloat16(1e-6))

    print(f"manual LN bf16     : {timeit(jax.jit(manual_ln_bf16), x):6.2f} ms")

    # attention glue: module path (pad+transpose each call) vs pre-padded
    qkv = jnp.asarray(rng.standard_normal((B, N, H, E // H)), jnp.bfloat16)
    qkvp = jnp.asarray(rng.standard_normal((B, NP, H, E // H)), jnp.bfloat16)
    scale = (E // H) ** -0.5
    print(f"flash w/ pad+mask  : {timeit(jax.jit(functools.partial(_sdpa_flash, scale=scale)), qkv, qkv, qkv):6.2f} ms")
    print(f"flash pre-padded   : {timeit(jax.jit(functools.partial(_sdpa_flash, scale=scale)), qkvp, qkvp, qkvp):6.2f} ms")

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    def flash_nomask(q, k, v):
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=scale,
            block_sizes=BlockSizes(block_q=896, block_k_major=896, block_k=896,
                                   block_b=1))
        return out.transpose(0, 2, 1, 3)

    print(f"flash 1792 no mask : {timeit(jax.jit(flash_nomask), qkvp, qkvp, qkvp):6.2f} ms")


if __name__ == "__main__":
    main()
