#!/usr/bin/env python
"""Mask-transformer variant @588px, dice-only loss (reference
eval/eval_dinov2_masktrans_inov.py:355-358)."""
from _variant import run

if __name__ == "__main__":
    run("tap_masktrans", {"imsize": 588, "loss": "dc"})
