#!/usr/bin/env python
"""MLA-decoder trainer (reference train_mla.py): same skeleton as train.py with
DecoderMLA fed all four per-round adapter outputs. The reference's 4th adapter
round re-runs blocks[-2:-1] instead of the last block (train_mla.py:339-341,
SURVEY §2.12 #2) — opt in with --mla_last_block_bug for exact parity; its
optimizer also covers the decoder ONLY (train_mla.py:178-183), reproduced via
--parity_frozen_head."""

import os

import train as _train

if __name__ == "__main__":
    parser = _train.get_args_parser()
    parser.add_argument("--mla_last_block_bug", action="store_true")
    args = parser.parse_args()
    args.decoder = "mla"
    os.makedirs(args.output_dir, exist_ok=True)
    _train.train_seg(args)
