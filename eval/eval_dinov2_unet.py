#!/usr/bin/env python
"""Truncated feature-space UNet variant (reference eval/eval_dinov2_unet.py)."""
from _variant import run

if __name__ == "__main__":
    run("tap_unet")
