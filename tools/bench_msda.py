#!/usr/bin/env python
"""Standalone MSDA kernel micro-benchmark at flagship geometries (ViT-L@588).

CAViT: queries = 1764 ViT tokens, values = 3-level CNN pyramid (84,84/42,42/21,21)
CACNN: queries = 9261 CNN tokens,  values = single-level ViT (42,42)

Times fwd and fwd+bwd per call (bs16, 8 heads, D=64, bf16) for the pallas
split-bwd and merged-bwd paths.  TPU timing per CLAUDE.md: host transfer per
measurement, ~30 ms RPC subtracted implicitly by per-call division over REPS.
"""
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os  # noqa: E402

import adaptersis_tpu.ops.msda_pallas as mp  # noqa: E402

if os.environ.get("ASN_GW_BWD"):
    mp._GW = int(os.environ["ASN_GW_BWD"])
if os.environ.get("ASN_GW_FWD"):
    mp._GW_FWD = int(os.environ["ASN_GW_FWD"])
if os.environ.get("ASN_MSDA_UFORM"):
    mp.use_uform_bwd(os.environ["ASN_MSDA_UFORM"] == "1")
if os.environ.get("ASN_REDUCE_DOT"):
    mp.use_reduce_dot(os.environ["ASN_REDUCE_DOT"] == "1")
if os.environ.get("ASN_GATHER_BWD"):
    mp.use_gather_bwd(os.environ["ASN_GATHER_BWD"] == "1")
if os.environ.get("ASN_TQ_BWD"):
    mp._TQ_BWD = int(os.environ["ASN_TQ_BWD"])
if os.environ.get("ASN_EXPAND_FWD"):
    mp.use_expand_fwd(os.environ["ASN_EXPAND_FWD"] == "1")

B, M, D, P = 16, 8, 128, 4   # the flagship MSDA geometry (d_value 1024 / 8 heads)
REPS = 10

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, *args):
    out = fn(*args)            # compile
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), out)
    # host transfer to defeat the tunnel's early block_until_ready return
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    dt = (time.perf_counter() - t0) / REPS
    return dt * 1e3  # ms


def bench(name, shapes, Lq, query_shapes):
    """query_shapes: raster grids the queries live on (reference points are the
    query's own normalized raster position — the locality the kernel exploits,
    exactly like models/adapters.get_reference_points)."""
    from adaptersis_tpu.models.adapters import get_reference_points

    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.bfloat16)
    ref = np.asarray(get_reference_points(query_shapes))  # (1, Lq, 1 or L, 2)
    assert ref.shape[1] == Lq, (ref.shape, Lq)
    base = ref[:, :, None, :, None, :]  # (1, Lq, 1, L?, 1, 2)
    if base.shape[3] != L:
        base = np.broadcast_to(base, (1, Lq, 1, L, 1, 2))
    hw = np.array([(1.0 / w, 1.0 / h) for h, w in shapes])  # (L, 2) xy scale
    loc = jnp.asarray(
        base + rng.uniform(-2, 2, (B, Lq, M, L, P, 2)) * hw[None, None, None, :, None, :],
        jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, Lq, M * D)), jnp.bfloat16)

    fwd = jax.jit(lambda v_, l_, w_: mp.msda_pallas(v_, l_, w_, tuple(shapes)))
    # the cotangent must DEPEND on the forward output ((out+t)² not out·t):
    # with a constant cotangent XLA dead-code-eliminates the fwd kernel from
    # the grad program and "fwd+bwd" silently measures bwd-only
    g = jax.jit(jax.grad(
        lambda v_, l_, w_: ((mp.msda_pallas(v_, l_, w_, tuple(shapes)) + t) ** 2
                            ).sum(), argnums=(0, 1, 2)))
    f_ms = timeit(fwd, v, loc, aw)
    fb_ms = timeit(g, v, loc, aw)
    print(f"{name:8s} fwd {f_ms:7.2f} ms   fwd+bwd {fb_ms:7.2f} ms")
    return f_ms, fb_ms


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    # ViT-L@588 geometry: ViT grid 42×42, encoder pyramid 73/37/19
    cnn_shapes = [(73, 73), (37, 37), (19, 19)]
    modes = (True,) if "--merged-only" in sys.argv else (False, True)
    for merged in modes:
        mp.use_merged_bwd(merged)
        print(f"--- merged_bwd={merged} ---")
        try:
            bench("CAViT", tuple(cnn_shapes), 1764, [(42, 42)])
            bench("CACNN", ((42, 42),), sum(h * w for h, w in cnn_shapes),
                  cnn_shapes)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL: {type(e).__name__}: {str(e)[:300]}")
    mp.use_merged_bwd(False)
