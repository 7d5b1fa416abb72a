#!/usr/bin/env python
"""Dump the optimized HLO of the exact bench.py train step to a file, so the
per-op names in a profile trace (fusion.NNN, copy.NNN — tools/parse_trace.py)
can be mapped back to the computations they execute. Rides the persistent
compile cache: run bench.py (or any compile of the step) first and this is
fast; cold it pays the one remote compile.

Usage: python tools/dump_step_hlo.py [outfile=/tmp/step_hlo.txt]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from adaptersis_tpu.models import AdapterSegmentor, build_backbone
    from adaptersis_tpu.parallel.mesh import get_mesh
    from adaptersis_tpu.train import Trainer, TrainerConfig

    BATCH, IMSIZE = 16, 588
    backbone = build_backbone("vit_large", img_size=518, patch_size=14,
                              attn_impl=os.environ.get("ASN_ATTN", "flash_fwd"),
                              gelu_approx=True,
                              ln_impl=os.environ.get("ASN_LN", "xla"),
                              mlp_impl=os.environ.get("ASN_MLP", "pallas"),
                              qkv_impl=os.environ.get("ASN_QKV", "pallas"),
                              dtype=jnp.bfloat16)
    model = AdapterSegmentor(backbone=backbone, num_classes=2, n_last_blocks=4,
                             msda_impl="pallas", dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainerConfig(loss="dc", use_clahe=True),
                      mesh=get_mesh(fsdp=1))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (BATCH, IMSIZE, IMSIZE, 3), np.uint8))
    masks = jnp.asarray((rng.uniform(size=(BATCH, IMSIZE, IMSIZE)) > 0.8)
                        .astype(np.int32))
    state = trainer.init_state((imgs, masks))
    key = jax.random.PRNGKey(0)

    from adaptersis_tpu.parallel.mesh import shard_batch
    imgs, masks = shard_batch((imgs, masks), trainer.mesh)
    lr = jnp.asarray(trainer.lr_fn(0), jnp.float32)
    step = trainer._build_train_step()
    compiled = step.lower(state, imgs, masks, key, lr).compile()
    out.write_text(compiled.as_text())
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
