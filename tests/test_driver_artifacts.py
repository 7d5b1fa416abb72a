"""Driver-artifact smoke tests.

`bench.py` and `__graft_entry__.py` are the programs the round driver runs on
real hardware (the headline BENCH_r*.json measurement and the single-chip
compile check). Nothing else imports them, so without these tests a refactor
could silently break the headline measurement and only be discovered at round
end. Both run here on the 8-device virtual CPU mesh (tests/conftest.py).
"""

import json
import sys
from pathlib import Path

import jax

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def test_bench_cpu_smoke(monkeypatch, capsys):
    """bench.main() end-to-end at a tiny geometry: one fused train step per
    timing window, JSON schema asserted. The ASN_* overrides exist for exactly
    this (bench.py keeps the recorded headline pinned to the defaults)."""
    monkeypatch.setenv("ASN_ARCH", "vit_small")
    monkeypatch.setenv("ASN_IMSIZE", "140")
    monkeypatch.setenv("ASN_BATCH", "2")
    monkeypatch.setenv("ASN_STEPS", "1")
    monkeypatch.setenv("ASN_REPEATS", "1")
    import bench

    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines, "bench.main() printed no JSON line"
    rec = json.loads(lines[-1])
    for k in ("metric", "value", "unit", "vs_baseline", "spread", "mfu"):
        assert k in rec, f"bench JSON missing {k!r}"
    assert rec["unit"] == "img/s/chip"
    assert rec["value"] > 0
    assert rec["spread"][0] <= rec["value"] <= rec["spread"][1]


def test_graft_entry_lowers():
    """entry() returns a jittable fn at the bench geometry; lowering (trace +
    StableHLO emission, no execution) catches model/API breakage cheaply —
    actually running ViT-L@588 on the CPU backend is not worth the suite time."""
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert "main" in lowered.as_text()[:4000]
