"""Shared launcher for the eval-script variants (reference eval/eval_dinov2_*.py).

Each reference eval script is ~500 lines of copy-paste trainer + a distinct head;
here each is a 10-line wrapper selecting a TapSegmentor variant through the shared
trainer (SURVEY §1 'collapse them into one trainer')."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import train as _train  # the root CLI


def run(model: str, extra_defaults=None):
    parser = _train.get_args_parser()
    args = parser.parse_args()
    args.model = model
    for k, v in (extra_defaults or {}).items():
        if parser.get_default(k) == getattr(args, k):
            setattr(args, k, v)
    import os
    os.makedirs(args.output_dir, exist_ok=True)
    _train.train_seg(args)
