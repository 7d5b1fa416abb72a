"""Cluster launchers (reference: dinov2/run/submit.py + dinov2/run/{train,eval}/*
submitit SLURM launchers, dinov2/utils/cluster.py).

The reference submits SLURM array jobs with requeue-on-preemption
(DelayedSubmission checkpointing, run/train/train.py:27-32). The TPU equivalent
writes an sbatch (or GKE/xpk-style) script that re-execs the same entry point;
resume comes from the orbax checkpoint in --output_dir, so a requeue IS a resume
(SURVEY §5: 'Recovery = restart + checkpoint resume').
"""

from __future__ import annotations

import os
import shlex
import subprocess
import sys
from typing import List, Optional


def detect_cluster() -> str:
    """cluster-type autodetect (reference utils/cluster.py:18-28)."""
    if os.environ.get("SLURM_JOB_ID"):
        return "slurm"
    if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return "tpu-pod"
    return "local"


def write_sbatch(script_path: str, entry: List[str], nodes: int = 1,
                 timeout_min: int = 2800, partition: str = "learnlab",
                 job_name: str = "adaptersis", max_requeue: int = 30) -> str:
    """Emit an sbatch file equivalent to the reference's submitit parameters
    (run/submit.py:92-123: nodes, timeout, partition, slurm_max_num_timeout)."""
    cmd = " ".join(shlex.quote(a) for a in entry)
    body = f"""#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --nodes={nodes}
#SBATCH --time={timeout_min}
#SBATCH --partition={partition}
#SBATCH --requeue
#SBATCH --open-mode=append
# requeue-on-preemption == checkpoint resume (orbax state in --output_dir)
srun --unbuffered {cmd}
"""
    with open(script_path, "w") as f:
        f.write(body)
    return script_path


def submit(entry: List[str], nodes: int = 1, **kw) -> Optional[str]:
    """sbatch-submit if on a SLURM cluster, else exec locally (the reference's
    single-GPU fallback path)."""
    cluster = detect_cluster()
    if cluster == "slurm":
        path = write_sbatch("/tmp/adaptersis_submit.sh", entry, nodes=nodes, **kw)
        out = subprocess.run(["sbatch", path], capture_output=True, text=True)
        print(out.stdout.strip())
        return out.stdout.strip().split()[-1] if out.returncode == 0 else None
    print(f"[launch] cluster={cluster}; running inline: {' '.join(entry)}")
    os.execv(sys.executable, [sys.executable] + entry)
