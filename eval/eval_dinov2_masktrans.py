#!/usr/bin/env python
"""Mask-transformer (Segmenter) variant @392px (reference
eval/eval_dinov2_masktrans.py: torchvision transforms at 392, weighted CE +
argmax-dice loss)."""
from _variant import run

if __name__ == "__main__":
    run("tap_masktrans", {"imsize": 392})
