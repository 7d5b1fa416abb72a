#!/usr/bin/env python
"""Re-parse a saved xplane trace (from tools/profile_step.py) without a TPU
run: list top INDIVIDUAL op events (with instance index) matching a pattern.

Usage: python tools/parse_trace.py <xplane.pb> [pattern] [topN]
"""
import collections
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main():
    pb = Path(sys.argv[1])
    pat = sys.argv[2] if len(sys.argv) > 2 else ""
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    pd = jax.profiler.ProfileData.from_serialized_xspace(pb.read_bytes())
    raw = collections.Counter()
    n = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "Ops" not in line.name:
                continue
            for ev in line.events:
                if pat in ev.name:
                    key = ev.name.split(" = ")[0].lstrip("%")
                    raw[key] += ev.duration_ns / 1e6
                    n[key] += 1
    for name, ms in raw.most_common(top):
        print(f"{ms / 3:9.3f} ms/step  x{n[name] // 3:<3d} {name}")


if __name__ == "__main__":
    main()
