#!/usr/bin/env python
"""Quality-parity harness — one command from dataset to the reference
comparison table (BASELINE.md protocol steps 1-3).

Trains the flagship recipe to convergence and emits a JSON + markdown table of
Dice / acc1 (and ch_iou / isi_iou for multi-class runs) next to optional
reference numbers, flagging any metric further than --tolerance (default
0.3 pt, the north-star bar) from the reference.

    # the day a Robust-MIS mount appears:
    python tools/quality_parity.py --data_path /data/robomis \\
        --arch vit_large --patch_size 14 --imsize 588 --epochs 500 \\
        --pretrained_weights dinov2_vitl14.pth \\
        --reference_json ref_metrics.json --output_dir /tmp/parity

    # CI dry-run (synthetic, seconds):
    python tools/quality_parity.py --synthetic --platform cpu --epochs 1 \\
        --arch vit_small --imsize 140 --batch_size_per_gpu 2 \\
        --output_dir /tmp/parity_dry

reference_json format: {"dice": 0.91, "acc1": 0.97, ...} — measure it once by
training the reference repo (no published numbers exist, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import train as train_mod  # noqa: E402

METRIC_KEYS = ("dice", "acc1", "ch_iou", "isi_iou", "loss")
LOWER_IS_BETTER = {"loss"}


def parse_args():
    p = train_mod.get_args_parser()
    p.add_argument("--reference_json", default="", type=str,
                   help="JSON of reference metrics to compare against")
    p.add_argument("--tolerance", default=0.003, type=float,
                   help="max |ours − reference| per metric (fraction; 0.003 = "
                        "0.3 pt, the BASELINE.md north star)")
    return p.parse_args()


def final_metrics(output_dir: str) -> dict:
    """Last epoch's test_* metrics from the trainer's log.txt JSONL."""
    rows = [json.loads(l) for l in
            (Path(output_dir) / "log.txt").read_text().splitlines() if l.strip()]
    tests = [r for r in rows if any(k.startswith("test_") for k in r)]
    if not tests:
        raise SystemExit("no test_* rows in log.txt — did validation run?")
    last = tests[-1]
    return {k[len("test_"):]: v for k, v in last.items() if k.startswith("test_")}


def main():
    args = parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    train_mod.train_seg(args)

    ours = final_metrics(args.output_dir)
    ref = json.loads(Path(args.reference_json).read_text()) if args.reference_json else {}

    rows = []
    ok = True
    for k in METRIC_KEYS:
        if k not in ours:
            continue
        r = ref.get(k)
        delta = None if r is None else ours[k] - r
        if delta is None:
            verdict = "—"
        else:
            better = ours[k] < r if k in LOWER_IS_BETTER else ours[k] > r
            verdict = "PASS" if abs(delta) <= args.tolerance or better else "FAIL"
        ok &= verdict != "FAIL"
        rows.append((k, ours[k], r, delta, verdict))

    table = ["| metric | ours | reference | Δ | verdict |",
             "|---|---|---|---|---|"]
    for k, o, r, d, v in rows:
        table.append(f"| {k} | {o:.4f} | {'' if r is None else f'{r:.4f}'} | "
                     f"{'' if d is None else f'{d:+.4f}'} | {v} |")
    report = "\n".join(table)
    print(report)
    out = {"metrics": ours, "reference": ref,
           "tolerance": args.tolerance, "parity_ok": ok}
    (Path(args.output_dir) / "parity.json").write_text(json.dumps(out, indent=2))
    (Path(args.output_dir) / "parity.md").write_text(report + "\n")
    if ref and not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
