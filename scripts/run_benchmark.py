#!/usr/bin/env python
"""Benchmark harness (the reference shipped this file EMPTY — run_benchmark.py:1).

Delegates to the repo-root bench.py: measures the north-star metric
(W10 training windows/sec/chip) and prints one JSON line."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def cli():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--f32", action="store_true",
                   help="Also measure the float32 variant (slower run)")
    args = p.parse_args()
    if args.f32 and "--f32" not in sys.argv:
        sys.argv.append("--f32")
    from bench import main

    main()


if __name__ == "__main__":
    cli()
