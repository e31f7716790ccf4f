#!/usr/bin/env python
"""Preprocess paired npz motions into windowed training artifacts.

CLI twin of reference scripts/data/process_data.py:143-150 (same flags,
same artifact names). Add --synthetic to generate a synthetic dataset when
the ModelScope download is unavailable.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", type=str,
                   default="./data/raw/unzipped/extended_datasets/lafan1_dataset/g1")
    p.add_argument("--output_dir", type=str, default="./data/processed")
    p.add_argument("--window", type=int, default=64)
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="Generate synthetic paired data instead of reading npz")
    p.add_argument("--n_sequences", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.synthetic:
        from bridgerl_tpu.data import generate_synthetic_dataset
        arrays = generate_synthetic_dataset(
            args.output_dir, n_sequences=args.n_sequences,
            window=args.window, step=args.step, seed=args.seed)
        print(f"Synthetic data: robot {arrays['g1_train.npy'].shape}, "
              f"human {arrays['human_train.npy'].shape} -> {args.output_dir}")
    else:
        from bridgerl_tpu.data import process_paired_data
        process_paired_data(args.input_dir, args.output_dir,
                            window=args.window, step=args.step,
                            overwrite=args.overwrite)


if __name__ == "__main__":
    main()
