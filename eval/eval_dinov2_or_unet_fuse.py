#!/usr/bin/env python
"""OR-UNet multi-scale fusion variant (reference eval/eval_dinov2_or_unet_fuse.py:
full-image UNet, 3 backbone passes at scales 1.0/1.5/0.5 fused into stages 1-3)."""
from _variant import run

if __name__ == "__main__":
    run("tap_unet_fuse")
