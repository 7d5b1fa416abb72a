#!/usr/bin/env python
"""CLI wrapper for the endovis2017 offline converter (reference tools/process_endovis2017.py).
Usage: python tools/process_endovis2017.py <root_dir> <out_dir_or_data_file>"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adaptersis_tpu.data.process.endovis2017 import process

if __name__ == "__main__":
    process(sys.argv[1], sys.argv[2])
