#!/usr/bin/env python
"""Aggregate training logs -> metric curves + radar chart
(CLI twin of reference scripts/evaluation/plot_results.py:200-218)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=str, default="results")
    p.add_argument("--out", type=str, default="plots/metrics")
    p.add_argument("--filter", type=str, default=None)
    args = p.parse_args()

    from bridgerl_tpu.eval import plot_all

    written = plot_all(args.dir, args.out, args.filter)
    for w in written:
        print(f"Saved {w}")
    if not written:
        print(f"No log files found in {args.dir}")


if __name__ == "__main__":
    main()
