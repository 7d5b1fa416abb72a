#!/usr/bin/env python
"""SETR-decoder eval variant (reference eval/eval_dinov2_setr.py: concat last-4
patch tokens → Decoder2D conv-up stack, loss CE+DC)."""
from _variant import run

if __name__ == "__main__":
    run("tap_setr")
