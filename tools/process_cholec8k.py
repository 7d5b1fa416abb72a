#!/usr/bin/env python
"""CLI wrapper for the cholec8k offline converter (reference tools/process_cholec8k.py).
Usage: python tools/process_cholec8k.py <root_dir> <out_dir_or_data_file>"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adaptersis_tpu.data.process.cholec8k import process

if __name__ == "__main__":
    process(sys.argv[1], sys.argv[2])
