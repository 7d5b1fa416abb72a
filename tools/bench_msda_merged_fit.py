#!/usr/bin/env python
"""Find a merged-kernel configuration that fits the 16 MB scoped-VMEM ceiling
at the flagship CAViT geometry (D=128, G=7, Lq=1764, bs16) and measure it.

Tries GW ∈ {1024, 512} by toggling msda_pallas._GW (clearing the plan cache).
Each attempt compiles standalone fwd+bwd; prints time or the VMEM excess.
"""
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import adaptersis_tpu.ops.msda_pallas as mp  # noqa: E402
from adaptersis_tpu.models.adapters import get_reference_points  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, M, D, P = 16, 8, 128, 4
SHAPES = ((73, 73), (37, 37), (19, 19))
LQ = 1764
REPS = 10


def data():
    rng = np.random.default_rng(0)
    S = sum(h * w for h, w in SHAPES)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.bfloat16)
    ref = np.asarray(get_reference_points([(42, 42)]))
    base = np.broadcast_to(ref[:, :, None, :, None, :], (1, LQ, 1, 3, 1, 2))
    hw = np.array([(1.0 / w, 1.0 / h) for h, w in SHAPES])
    loc = jnp.asarray(base + rng.uniform(-2, 2, (B, LQ, M, 3, P, 2))
                      * hw[None, None, None, :, None, :], jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, LQ, M, 3, P)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, LQ, M * D)), jnp.bfloat16)
    return v, loc, aw, t


def run_fwd(tag):
    v, loc, aw, _ = data()
    f = jax.jit(lambda v_, l_, w_: mp.msda_pallas(v_, l_, w_, SHAPES))
    try:
        out = f(v, loc, aw)
        out.block_until_ready()
        float(jnp.asarray(out).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(v, loc, aw)
        float(jnp.asarray(out).astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{tag}: fwd {dt:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        i = msg.find("Scoped allocation")
        print(f"{tag}: FAIL {msg[i:i + 90] if i >= 0 else msg[:160]}", flush=True)


def run(tag):
    v, loc, aw, t = data()
    g = jax.jit(jax.grad(
        lambda v_, l_, w_: (mp.msda_pallas(v_, l_, w_, SHAPES) * t).sum(),
        argnums=(0, 1, 2)))
    try:
        out = g(v, loc, aw)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = g(v, loc, aw)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{tag}: fwd+bwd {dt:.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        i = msg.find("Scoped allocation")
        print(f"{tag}: FAIL {msg[i:i + 90] if i >= 0 else msg[:160]}", flush=True)
        return None


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    mp.use_merged_bwd(False)
    for gw in (1024, 512, 2048):
        mp._GW = gw
        mp._plan.cache_clear()
        run_fwd(f"fwd GW={gw}")
    mp._GW = 1024
    mp._plan.cache_clear()
    run("split GW=1024")
    mp.use_merged_bwd(True)
    run("merged GW=1024")
    mp.use_merged_bwd(False)
