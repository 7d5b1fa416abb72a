"""Multi-host process management (reference: utils.py:467-499
init_distributed_mode + dinov2/distributed/__init__.py).

The reference parses RANK/WORLD_SIZE/SLURM env and calls
torch.distributed.init_process_group("nccl"). The JAX equivalent is
jax.distributed.initialize() (coordinator-based); within a host, all local TPU
chips are already visible, so single-host multi-chip needs NO process management at
all — the common multi-GPU case (torch.distributed.launch --nproc_per_node=N,
README.md:49) collapses into one process with a bigger mesh.
"""

from __future__ import annotations

import os

import jax


def init_distributed(dist_url: str = "env://") -> None:
    """Multi-host init if the SLURM/JAX env indicates it; no-op single host.
    Mirrors init_distributed_mode's env detection (utils.py:467-499)."""
    if int(os.environ.get("SLURM_NTASKS", "1")) > 1 or "JAX_COORDINATOR_ADDRESS" in os.environ:
        kwargs = {}
        if "JAX_COORDINATOR_ADDRESS" in os.environ:
            kwargs = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
            )
        jax.distributed.initialize(**kwargs)


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0
