#!/usr/bin/env python
"""Benchmark harness (the reference shipped this file EMPTY — run_benchmark.py:1).

Delegates to the repo-root bench.py, which measures the north-star metric
(W10 training windows/sec/chip) and prints one JSON line."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import main  # noqa: E402

if __name__ == "__main__":
    main()
