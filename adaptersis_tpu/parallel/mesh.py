"""Device-mesh + sharding helpers — the TPU-native replacement for the reference's
DDP/NCCL runtime (utils.py:423-499, dinov2/distributed/).

Design (SURVEY §2.10): a 2-D mesh ("data", "fsdp"). Adapter training is pure data
parallelism (all trainables replicated, batch sharded on "data") — gradients
all-reduce over ICI automatically under jit/GSPMD, replacing DDP's NCCL hooks. The
"fsdp" axis is for parameter sharding of the large frozen backbone (ZeRO-3-like,
reference dinov2/fsdp/) — leaves whose first dim divides the axis are sharded.

SyncBatchNorm comes for free: BN statistics are global-batch reductions under jit,
so XLA inserts the cross-replica psums (reference needed nn.SyncBatchNorm +
process groups, backbones/encoders.py:12).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices: Optional[Sequence] = None, fsdp: int = 1,
             axis_names=("data", "fsdp")) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % max(fsdp, 1):
        raise ValueError(f"{n} devices not divisible by fsdp={fsdp}")
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, axis_names)


def shard_batch(batch: Any, mesh: Mesh):
    """Put a host batch onto the mesh, sharded over 'data' on the leading axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree: Any, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def fsdp_spec(x, n_fsdp: int, min_size: int = 2**16) -> P:
    """FSDP sharding rule for one leaf: shard its largest n_fsdp-divisible axis
    over the 'fsdp' mesh axis, replicate small/indivisible leaves."""
    if n_fsdp == 1 or x.ndim == 0 or x.size < min_size:
        return P()
    dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in dims:
        if x.shape[d] % n_fsdp == 0:
            spec = [None] * x.ndim
            spec[d] = "fsdp"
            return P(*spec)
    return P()


def fsdp_shard_params(params: Any, mesh: Mesh, min_size: int = 2**16):
    """FSDP-style sharding (ZeRO-3 analogue of dinov2/fsdp FULL_SHARD): apply
    `fsdp_spec` to every leaf."""
    n_fsdp = mesh.shape["fsdp"]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, fsdp_spec(x, n_fsdp, min_size))), params
    )
