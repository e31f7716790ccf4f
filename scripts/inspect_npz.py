#!/usr/bin/env python
"""Print keys/shapes of npz files (CLI twin of reference scripts/data/inspect_npz.py)."""

import argparse
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", nargs="?", default="data/raw/unzipped",
                   help="npz file or directory to scan")
    args = p.parse_args()

    from bridgerl_tpu.data import inspect_npz

    files = [args.path] if args.path.endswith(".npz") else sorted(
        glob.glob(os.path.join(args.path, "**", "*.npz"), recursive=True))[:1]
    if not files:
        print(f"No npz files under {args.path}")
        return
    for f in files:
        print(f"== {f} ==")
        for k, (shape, dtype) in inspect_npz(f).items():
            print(f"  {k}: shape={shape} dtype={dtype}")


if __name__ == "__main__":
    main()
