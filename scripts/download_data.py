#!/usr/bin/env python
"""Download the paired SMPL-X/G1 dataset from ModelScope
(CLI twin of reference scripts/data/download_data.py:12-16).

Requires network access + the `modelscope` package; in offline environments
use `scripts/process_data.py --synthetic` instead."""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dest", type=str, default="./data/raw")
    args = p.parse_args()
    try:
        from modelscope.hub.snapshot_download import snapshot_download
    except ImportError:
        print("modelscope is not installed; for offline use run:\n"
              "  python scripts/process_data.py --synthetic")
        return
    path = snapshot_download("seulzx/smplx_datasets", repo_type="dataset",
                             cache_dir=args.dest)
    print(f"Downloaded to {path}")


if __name__ == "__main__":
    main()
