#!/usr/bin/env python
"""Download + verify the paired SMPL-X/G1 dataset from ModelScope
(CLI twin of reference scripts/data/download_data.py:12-16, plus a
checksum/schema verification layer the reference lacks).

Zero-egress environments: `--fixture` builds a schema-identical npz tree so
the full pipeline runs offline; `--verify` validates any existing tree
against data/raw/MANIFEST.json (first verified run records checksums)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dest", type=str, default="./data/raw")
    p.add_argument("--verify", action="store_true",
                   help="schema+checksum verify the tree under --dest "
                        "(records checksums on first verified run)")
    p.add_argument("--fixture", action="store_true",
                   help="build the offline schema fixture tree instead of "
                        "downloading (zero-egress environments)")
    p.add_argument("--skip_download", action="store_true",
                   help="verify only; do not attempt the hub fetch")
    args = p.parse_args()

    if args.fixture:
        from bridgerl_tpu.data import synthetic_npz_tree
        root = synthetic_npz_tree(args.dest)
        print(f"Schema fixture written under {root}")
    elif not args.skip_download:
        try:
            from modelscope.hub.snapshot_download import snapshot_download
        except ImportError:
            print("modelscope is not installed; offline options:\n"
                  "  python scripts/download_data.py --fixture   (schema fixture)\n"
                  "  python scripts/process_data.py --synthetic  (full synthetic set)")
            if not args.verify:
                return 1
        else:
            from bridgerl_tpu.data import DATASET
            path = snapshot_download(DATASET["id"], repo_type=DATASET["repo_type"],
                                     cache_dir=args.dest)
            print(f"Downloaded to {path}")
            print("Extract any .tar.bz2 archives before processing.")

    if args.verify or args.fixture:
        from bridgerl_tpu.data import verify_tree
        report = verify_tree(args.dest)
        print(report.summary())
        for e in report.errors[:20]:
            print(f"  {e}")
        return 0 if report.ok else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
