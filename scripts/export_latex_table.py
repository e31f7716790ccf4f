#!/usr/bin/env python
"""Print the LaTeX ablation results table
(CLI twin of reference scripts/evaluation/export_latex_table.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=str, default="results")
    args = p.parse_args()

    from bridgerl_tpu.eval import generate_latex

    print("-" * 60)
    print("LaTeX Table Code (Copy below):")
    print("-" * 60)
    print()
    print(generate_latex(args.dir))
    print()


if __name__ == "__main__":
    main()
