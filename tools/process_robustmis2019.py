#!/usr/bin/env python
"""CLI wrapper for the robustmis2019 offline converter (reference tools/process_robustmis2019.py).
Usage: python tools/process_robustmis2019.py <root_dir> <out_dir_or_data_file>"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adaptersis_tpu.data.process.robustmis2019 import process

if __name__ == "__main__":
    process(sys.argv[1], sys.argv[2])
