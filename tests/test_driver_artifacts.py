"""Driver-artifact smoke tests.

`bench.py` and `__graft_entry__.py` are the programs the round driver runs on
real hardware (the headline BENCH_r*.json measurement and the single-chip
compile check). Nothing else imports them, so without these tests a refactor
could silently break the headline measurement and only be discovered at round
end. Both run here on the 8-device virtual CPU mesh (tests/conftest.py).
"""

import datetime
import json
import sys
from pathlib import Path

import jax
import pytest

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


@pytest.mark.slow
def test_dryrun_flagship_8_stays_ship_shape():
    """Pins the per-round multi-chip proof (VERDICT r4 weak #6): AOT-compile
    the EXACT bench program (ViT-L/14@588, bs16/shard) on the 8-device
    (data:4 × fsdp:2) mesh. Compile-only, ~13 min on this image's CPU — the
    cost is the point: without this test a refactor could silently stale
    FLAGSHIP_MULTICHIP.md. Asserts the frozen ViT really picks up fsdp
    shardings and the per-shard temp footprint stays inside a v5e-sized
    ceiling, then regenerates the committed artifact's JSON block."""
    import __graft_entry__ as g

    sizes = g.dryrun_flagship(8)
    assert sizes["n_fsdp_sharded_frozen_leaves"] > 0, sizes
    assert sizes["mesh"] == {"data": 4, "fsdp": 2}, sizes
    temp = sizes.get("temp_size_in_bytes", 0)
    if temp:  # backend-dependent availability
        # the CPU one-host program holds ALL 8 shards; per-shard must fit a
        # v5e HBM (15.75 GB) with headroom for fp32 masters + runtime
        assert temp / 8 < 12 * 2 ** 30, sizes

    md = ROOT / "FLAGSHIP_MULTICHIP.md"
    if md.exists():  # regenerate the committed JSON block in place
        text = md.read_text()
        head, sep, rest = text.partition("```json")
        _, sep2, tail = rest.partition("```")
        if sep and sep2:
            stamp = datetime.date.today().isoformat()
            block = json.dumps(sizes, indent=1)
            head = head.rstrip("\n").rsplit("Output, re-run", 1)[0]
            head += (f"Output, re-run {stamp} by "
                     "tests/test_driver_artifacts.py::"
                     "test_dryrun_flagship_8_stays_ship_shape:\n\n")
            md.write_text(head + "```json\n" + block + "\n```" + tail)
