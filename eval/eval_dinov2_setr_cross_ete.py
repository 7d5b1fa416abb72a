#!/usr/bin/env python
"""End-to-end SETR variant (reference eval/eval_dinov2_setr_cross_ete.py: backbone
trained, small Decoder2D head, cross-dataset validation via --cross_test_path)."""
from _variant import run

if __name__ == "__main__":
    run("tap_setr_ete")
