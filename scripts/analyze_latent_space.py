#!/usr/bin/env python
"""t-SNE latent-space analysis: domain-alignment + action-distribution plots
(CLI twin of reference scripts/evaluation/analyze_latent_space.py:162-313)."""

import argparse
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None,
                   help="Checkpoint path; default: all *_best.ckpt under --ckpt_dir")
    p.add_argument("--ckpt_dir", type=str, default="checkpoints")
    p.add_argument("--raw_dir", type=str, required=True,
                   help="Directory of raw npz motions (filenames carry action keywords)")
    p.add_argument("--data_dir", type=str, default="data/processed")
    p.add_argument("--out", type=str, default="plots/latent_space")
    p.add_argument("--max_per_action", type=int, default=300)
    p.add_argument("--ref_normalize", action="store_true",
                   help="normalize windows before encoding like the reference "
                        "(analyze_latent_space.py:99-100); models train on "
                        "raw windows, so the default keeps them "
                        "in-distribution (docs/REF_EXACT.md)")
    args = p.parse_args()

    from bridgerl_tpu.eval import analyze_checkpoint

    ckpts = [args.ckpt] if args.ckpt else sorted(
        glob.glob(os.path.join(args.ckpt_dir, "*_best.ckpt")))
    for ck in ckpts:
        written = analyze_checkpoint(ck, args.raw_dir, args.data_dir, args.out,
                                     args.max_per_action,
                                     ref_normalize=args.ref_normalize)
        for w in written:
            print(f"Saved {w}")


if __name__ == "__main__":
    main()
