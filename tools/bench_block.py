#!/usr/bin/env python
"""Frozen-walk block component micro-benchmark: where do the ~10.7 ms/layer go?

One ViT-L block application at the flagship shape (bs16, N=1765→1792 pad,
E=1024, 16 heads, bf16), fwd only (the walks sit under stop_gradient).
Times: full block, attention variants (tuned flash / einsum / flash block
sizes), bare qkv+proj matmuls, MLP, LayerNorm.
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

from adaptersis_tpu.models.layers import Attention, Block, _sdpa_einsum  # noqa: E402

B, N, E, H = 16, 1765, 1024, 16
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


def flash_at(q, k, v, scale, blk, block_b=1, pad_to=1792):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    Np = pad_to
    pad = Np - q.shape[1]

    def to_bhnd(t):
        t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return t.transpose(0, 2, 1, 3)

    ids = (jnp.arange(Np) < q.shape[1]).astype(jnp.int32)[None, :]
    ids = jnp.broadcast_to(ids, (q.shape[0], Np))
    out = flash_attention(
        to_bhnd(q), to_bhnd(k), to_bhnd(v),
        segment_ids=SegmentIds(q=ids, kv=ids), sm_scale=scale,
        block_sizes=BlockSizes(block_q=blk, block_k_major=blk, block_k=blk,
                               block_b=block_b))
    return out.transpose(0, 2, 1, 3)[:, :q.shape[1]]


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, E)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, N, H, E // H)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, H, E // H)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, H, E // H)), jnp.bfloat16)
    scale = (E // H) ** -0.5

    blk = Block(dim=E, num_heads=H, init_values=1e-5, attn_impl="flash",
                dtype=jnp.bfloat16)
    p = blk.init(jax.random.PRNGKey(0), x[:1, :8])
    print(f"full block (flash): {timeit(jax.jit(lambda x_: blk.apply(p, x_)), x):7.2f} ms")

    attn = Attention(num_heads=H, attn_impl="flash", dtype=jnp.bfloat16)
    pa = attn.init(jax.random.PRNGKey(0), x[:1, :8])
    print(f"attn module flash : {timeit(jax.jit(lambda x_: attn.apply(pa, x_)), x):7.2f} ms")
    attn_e = Attention(num_heads=H, attn_impl="einsum", dtype=jnp.bfloat16)
    print(f"attn module einsum: {timeit(jax.jit(lambda x_: attn_e.apply(pa, x_)), x):7.2f} ms")

    for b, bb in ((896, 1), (896, 2), (896, 4), (1792, 1), (448, 1), (448, 4)):
        try:
            ms = timeit(jax.jit(functools.partial(flash_at, blk=b, block_b=bb,
                                                  scale=scale)), q, k, v)
            print(f"flash sdpa blk={b:4d} block_b={bb}: {ms:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"flash sdpa blk={b:4d} block_b={bb}: FAIL {type(e).__name__} {str(e)[:120]}")
    print(f"einsum sdpa        : {timeit(jax.jit(functools.partial(_sdpa_einsum, scale=scale, dtype=jnp.bfloat16)), q, k, v):7.2f} ms")

    wq = jnp.asarray(rng.standard_normal((E, 3 * E)) * 0.02, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((E, E)) * 0.02, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, 4 * E)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4 * E, E)) * 0.02, jnp.float32)

    def qkv_proj(x_):
        y = x_ @ wq.astype(jnp.bfloat16)
        return y[..., :E] @ wo.astype(jnp.bfloat16)

    def mlp(x_):
        y = x_ @ w1.astype(jnp.bfloat16)
        y = jax.nn.gelu(y, approximate=False)
        return y @ w2.astype(jnp.bfloat16)

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    pl_ = ln.init(jax.random.PRNGKey(0), x[:1, :8])
    print(f"qkv+proj matmuls  : {timeit(jax.jit(qkv_proj), x):7.2f} ms")
    print(f"mlp (fc+gelu+fc)  : {timeit(jax.jit(mlp), x):7.2f} ms")
    print(f"layernorm ×2      : {timeit(jax.jit(lambda x_: ln.apply(pl_, ln.apply(pl_, x_))), x):7.2f} ms")


if __name__ == "__main__":
    main()
