#!/usr/bin/env python
"""Evaluate the quality-parity criteria (bridgerl_tpu/eval/parity.py) over
results/log_*.json and write PARITY.md. Exits non-zero if any evaluable
criterion fails."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", type=str, default="results")
    p.add_argument("--out", type=str, default="PARITY.md")
    args = p.parse_args()

    from bridgerl_tpu.eval.parity import (
        evaluate_generation,
        evaluate_parity,
        render_parity_md,
    )

    crits = evaluate_parity(args.log_dir) + evaluate_generation()
    md = render_parity_md(crits, args.log_dir)
    with open(args.out, "w") as f:
        f.write(md)
    print(md)
    failed = [c for c in crits if c.passed is False]
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
