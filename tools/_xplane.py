"""Shared xplane-trace aggregation for the step profilers
(tools/profile_step.py, profile_ssl_step.py, profile_m2f_step.py) — one copy
of the parse/aggregate loop instead of three drifting ones."""

from __future__ import annotations

import collections
import os
import re
from pathlib import Path


def print_top_ops(trace_dir: str, n_steps: int = 3, top: int = 40) -> None:
    """Aggregate per-op device self-time from the newest xplane in trace_dir
    and print the top entries (per-step ms, canonicalized op names)."""
    import jax

    pbs = sorted(Path(trace_dir).rglob("*.xplane.pb"), key=os.path.getmtime)
    if not pbs:
        print("no xplane captured (tunnel may not support device tracing)")
        return
    pd = jax.profiler.ProfileData.from_serialized_xspace(pbs[-1].read_bytes())
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "Ops" not in line.name:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name.split(" = ")[0].lstrip("%")
                name = re.sub(r"[.\d]+$", "", name)
                agg[name] += dur
                cnt[name] += 1
                total += dur
    print(f"total device op time over {n_steps} steps: {total:.1f} ms "
          f"({total / n_steps:.1f} ms/step)  [async spans double-count]")
    for name, ms in agg.most_common(top):
        print(f"{ms / n_steps:9.2f} ms/step  x{cnt[name] // n_steps:<4d} {name}")
