#!/usr/bin/env python
"""Profile the flagship train step and print the top ops by device self-time.

Runs bench.py's exact configuration for a few steps under jax.profiler.trace,
then parses the xplane with jax.profiler.ProfileData and aggregates per-op
durations on the device plane.
"""
import collections
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402

from adaptersis_tpu.models import AdapterSegmentor, build_backbone  # noqa: E402
from adaptersis_tpu.ops import msda_pallas  # noqa: E402
from adaptersis_tpu.parallel.mesh import get_mesh  # noqa: E402
from adaptersis_tpu.train import Trainer, TrainerConfig  # noqa: E402

BATCH, IMSIZE = 16, 588


def main():
    msda_pallas.use_merged_bwd(os.environ.get("ASN_MERGED_MSDA", "1") != "0")
    msda_pallas.use_uform_bwd(os.environ.get("ASN_MSDA_UFORM", "1") != "0")
    msda_pallas.use_gather_bwd(os.environ.get("ASN_GATHER_BWD", "1") != "0")
    backbone = build_backbone("vit_large", img_size=518, patch_size=14,
                              attn_impl=os.environ.get("ASN_ATTN", "flash_fwd"),
                              gelu_approx=True,
                              mlp_impl=os.environ.get("ASN_MLP", "pallas"),
                              qkv_impl=os.environ.get("ASN_QKV", "pallas"),
                              dtype=jnp.bfloat16)
    model = AdapterSegmentor(
        backbone=backbone, num_classes=2, n_last_blocks=4, msda_impl="pallas",
        batch_walks=os.environ.get("ASN_BATCH_WALKS", "0") == "1",
        dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainerConfig(loss="dc", use_clahe=True),
                      mesh=get_mesh(fsdp=1))
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (BATCH, IMSIZE, IMSIZE, 3), np.uint8)))
    masks = jax.device_put(jnp.asarray(
        (rng.uniform(size=(BATCH, IMSIZE, IMSIZE)) > 0.8).astype(np.int32)))
    state = trainer.init_state((imgs, masks))
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, loss = trainer.train_step(state, imgs, masks, k, epoch=0)
        float(loss)

    trace_dir = "/tmp/asn_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            key, k = jax.random.split(key)
            state, loss = trainer.train_step(state, imgs, masks, k, epoch=0)
        float(loss)

    # find the newest xplane.pb
    pbs = sorted(Path(trace_dir).rglob("*.xplane.pb"), key=os.path.getmtime)
    if not pbs:
        print("no xplane captured (tunnel may not support device tracing)")
        return
    import re

    pd = jax.profiler.ProfileData.from_serialized_xspace(pbs[-1].read_bytes())
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                # canonicalize: drop the %, the .N instance index and the
                # = ... detail so per-layer instances of the same op aggregate
                name = ev.name.split(" = ")[0].lstrip("%")
                name = re.sub(r"[.\d]+$", "", name)
                agg[name] += dur
                cnt[name] += 1
                total += dur
    print(f"planes: {[p.name for p in pd.planes]}")
    print(f"total device op time over 3 steps: {total:.1f} ms "
          f"({total / 3:.1f} ms/step)  [async spans double-count]")
    for name, ms in agg.most_common(45):
        print(f"{ms / 3:9.2f} ms/step  x{cnt[name] // 3:<4d} {name}")

    if os.environ.get("ASN_PROF_RAW"):
        # top individual events matching a substring, full shapes
        pat = os.environ["ASN_PROF_RAW"]
        raw = collections.Counter()
        for plane in pd.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            for line in plane.lines:
                if "Ops" not in line.name:
                    continue
                for ev in line.events:
                    if pat in ev.name:
                        raw[ev.name[:180]] += ev.duration_ns / 1e6
        print(f"--- raw events matching {pat!r} ---")
        for name, ms in raw.most_common(25):
            print(f"{ms / 3:9.2f} ms/step  {name}")


if __name__ == "__main__":
    main()
