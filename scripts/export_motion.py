#!/usr/bin/env python
"""Batch-export ground-truth + reconstructed motions from a checkpoint
(CLI twin of reference scripts/deployment/export_motion.py:85-229).

Unlike the reference, arch/method/window need not be passed: they are
recovered from the config stored inside the checkpoint."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="./data/processed")
    p.add_argument("--output_dir", type=str, default="./motions")
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--step_size", type=int, default=None,
                   help="Sliding-window stride; default window // 2")
    p.add_argument("--max_len", type=int, default=-1)
    p.add_argument("--ref_normalize", action="store_true",
                   help="normalize windows at inference like the reference "
                        "deployment (export_motion.py:47-53). Models TRAIN "
                        "on raw windows — this costs 20x recon MSE and half "
                        "the dynamics (docs/REF_EXACT.md). Default: raw.")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from bridgerl_tpu.export import export_motions

    export_motions(args.ckpt, data_dir=args.data_dir, output_dir=args.output_dir,
                   start_idx=args.start_idx, num_samples=args.num_samples,
                   step_size=args.step_size, max_len=args.max_len,
                   ref_normalize=args.ref_normalize)


if __name__ == "__main__":
    main()
