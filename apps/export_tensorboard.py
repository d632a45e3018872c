"""Convert a training run's ``metrics.jsonl`` into a TensorBoard event file.

The trainer writes both formats by default (``--tensorboard 1``); this tool
backfills event files for runs recorded before that, or re-exports after
deleting stale events.

Usage:
    python apps/export_tensorboard.py --run_dir log/map3dbn512 [--out DIR]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threedhumangan_tpu.utils.tb import EventWriter  # noqa: E402


def export(run_dir: str, out_dir: str = None) -> str:
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.isfile(path):
        raise FileNotFoundError(path)
    writer = EventWriter(out_dir or run_dir, filename_suffix=".export")
    n = 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            step = int(row.pop("step", 0))
            for tag, value in row.items():
                if isinstance(value, (int, float)):
                    writer.add_scalar(f"train/{tag}", value, step)
                    n += 1
    writer.close()
    print(f"wrote {n} scalars -> {writer.path}")
    return writer.path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True,
                    help="directory containing metrics.jsonl")
    ap.add_argument("--out", default=None, help="output dir (default: run_dir)")
    opt = ap.parse_args()
    export(opt.run_dir, opt.out)
