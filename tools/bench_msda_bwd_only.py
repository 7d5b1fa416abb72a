#!/usr/bin/env python
"""Time the MSDA backward pallas program in ISOLATION (no fwd kernel, no grad
glue): jit _msda_bwd directly with prebuilt residuals at flagship geometry.
Used to attribute fwd+bwd regressions to the right kernel."""
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import adaptersis_tpu.ops.msda_pallas as mp  # noqa: E402
from adaptersis_tpu.models.adapters import get_reference_points  # noqa: E402

# same A/B knobs as bench.py: ASN_GATHER_BWD=0 forces the u-form kernel,
# ASN_MSDA_UFORM=0 (with gather also off) the plain merged kernel
import os  # noqa: E402

mp.use_merged_bwd(os.environ.get("ASN_MERGED_MSDA", "1") != "0")
mp.use_uform_bwd(os.environ.get("ASN_MSDA_UFORM", "1") != "0")
mp.use_gather_bwd(os.environ.get("ASN_GATHER_BWD", "1") != "0")

B, M, D, P = 16, 8, 128, 4
REPS = 10

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    return (time.perf_counter() - t0) / REPS * 1e3


def bench(name, shapes, Lq, query_shapes):
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.bfloat16)
    ref = np.asarray(get_reference_points(query_shapes))
    base = ref[:, :, None, :, None, :]
    if base.shape[3] != L:
        base = np.broadcast_to(base, (1, Lq, 1, L, 1, 2))
    hw = np.array([(1.0 / w, 1.0 / h) for h, w in shapes])
    loc = jnp.asarray(
        base + rng.uniform(-2, 2, (B, Lq, M, L, P, 2)) * hw[None, None, None, :, None, :],
        jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, Lq, M * D)), jnp.float32)

    def bwd_fn(v_, l_, w_, g_):
        # build the residuals the VJP would have saved (vb folded at the fwd
        # group width — flat 2-D when D is a lane multiple — unpadded packed
        # factors, and the (M, flat) shape-carrying dtype carrier)
        TQ, Lqp = mp._prep_shapes(Lq)
        Gf, _, _ = mp._plan(tuple(shapes), mp._GW_FWD)
        flat = mp._flat2d(v_.shape[3])
        if flat:
            B_, S_, M_, D_ = v_.shape
            vb = jnp.pad(v_.reshape(B_, S_, M_ * D_),
                         [(0, 0), (0, Gf * mp._GW_FWD - S_), (0, 0)])
        else:
            vb = mp._fold_value(v_, Gf, gw=mp._GW_FWD)
        f = mp._fold_factors(l_, w_, tuple(shapes))
        res = (vb, f, jnp.zeros((v_.shape[2], int(flat), 0), l_.dtype),
               jnp.zeros((0,), w_.dtype))
        return mp._msda_bwd(tuple(shapes), res, g_)

    bwd = jax.jit(bwd_fn)
    ms = timeit(bwd, v, loc, aw, g)
    print(f"{name:8s} bwd-only {ms:7.2f} ms")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    cnn_shapes = [(73, 73), (37, 37), (19, 19)]
    bench("CAViT", tuple(cnn_shapes), 1764, [(42, 42)])
    bench("CACNN", ((42, 42),), sum(h * w for h, w in cnn_shapes), cnn_shapes)
