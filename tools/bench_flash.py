#!/usr/bin/env python
"""Sweep flash-attention BlockSizes at the flagship frozen-walk shape
(bs16, 1792 tokens incl. pad, 16 heads, Dh=64, bf16, validity segment ids).

The walks are pre-padded (segmentor pad_walks) so every call sees N=1792 and
persistent segment ids. With block_k == N the kernel runs ONE kv block per q
block — no online-softmax rescale. REPS-loop timing per CLAUDE.md (A/B only).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from jax.experimental.pallas.ops.tpu.flash_attention import (  # noqa: E402
    BlockSizes, SegmentIds, flash_attention)

B, N, H, Dh = 16, 1792, 16, 64
REPS = int(os.environ.get("ASN_REPS", "20"))


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, Dh)), jnp.bfloat16)
    ids = jnp.broadcast_to((jnp.arange(N) < 1765).astype(jnp.int32)[None],
                           (B, N))
    seg = SegmentIds(q=ids, kv=ids)

    cfgs = []
    for bq in (256, 448, 896, 1792):
        for bk in (896, 1792):
            if bk > N or bq > N:
                continue
            cfgs.append((bq, bk))

    def run(bq, bk):
        def f(q, k, v):
            y = q
            for _ in range(REPS):
                y = flash_attention(
                    y, k, v, segment_ids=seg, sm_scale=0.125,
                    block_sizes=BlockSizes(block_q=bq, block_k_major=bk,
                                           block_k=bk, block_b=1))
            return y

        fj = jax.jit(f)
        float(fj(q, k, v).sum())  # compile+warm
        t0 = time.perf_counter()
        float(fj(q, k, v).sum())
        return (time.perf_counter() - t0 - 0.03) / REPS * 1e3

    for bq, bk in cfgs:
        try:
            ms = run(bq, bk)
            print(f"bq={bq:5d} bk={bk:5d}: {ms:7.3f} ms/layer")
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:5d} bk={bk:5d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")

    # bespoke fwd-only kernel (ops/flash_fwd.py)
    from adaptersis_tpu.ops.flash_fwd import flash_fwd

    def fb(q, k, v):
        y = q
        for _ in range(REPS):
            y = flash_fwd(y, k, v, ids, 0.125)
        return y

    fj = jax.jit(fb)
    out = fj(q, k, v)
    # sanity vs library on the valid region before timing
    ref = flash_attention(q, k, v, segment_ids=seg, sm_scale=0.125,
                          block_sizes=BlockSizes(block_q=896,
                                                 block_k_major=1792,
                                                 block_k=1792, block_b=1))
    one = jax.jit(lambda q, k, v: flash_fwd(q, k, v, ids, 0.125))(q, k, v)
    err = float(jnp.max(jnp.abs(one.astype(jnp.float32)
                                - ref.astype(jnp.float32))[:, :, :1765]))
    float(out.sum())
    t0 = time.perf_counter()
    float(fj(q, k, v).sum())
    ms = (time.perf_counter() - t0 - 0.03) / REPS * 1e3
    print(f"flash_fwd bespoke : {ms:7.3f} ms/layer  (max |Δ| vs library "
          f"on valid rows: {err:.2e})")


if __name__ == "__main__":
    main()
