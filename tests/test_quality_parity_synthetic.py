"""Training-dynamics parity: the synthetic quality harness
(tools/quality_parity_synthetic.py) run for a few LOCKSTEP steps — identical
transplanted init, identical batches, identical SGD — must produce the same
per-step train-loss curve as the ACTUAL reference training math (torch CPU).

The whole-model parity test covers one forward+backward; this covers the
optimizer/BN-update loop (torch-SGD momentum+wd semantics, BN running-stat
updates, the level_embed-is-zeros-each-step reference quirk)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def qps():
    spec = importlib.util.spec_from_file_location(
        "qps_tool", str(Path(__file__).resolve().parent.parent
                        / "tools" / "quality_parity_synthetic.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["qps_tool"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_lockstep_loss_curves_match(qps):
    try:
        ref = qps.run_reference(steps=2, eval_every=2, batch=1, out_dir=None)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference modules not importable: {e}")
    ours = qps.run_ours(steps=2, eval_every=2, batch=1, out_dir=None)
    np.testing.assert_allclose(ours["loss_curve"], ref["loss_curve"],
                               rtol=2e-3, atol=2e-3)
    last = max(ref["val"])
    for m in ("dice", "acc1"):
        assert abs(ours["val"][last][m] - ref["val"][last][m]) < 3e-3, m
