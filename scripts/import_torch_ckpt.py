#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth) into a bridgerl .ckpt.

The migration path for users of the reference repo: bring any trained
`{run}_last/best/final.pth` (scripts/train_ablation.py:276-284, 357-364) and
run every TPU surface here — export, serving artifacts, replay, eval — on the
same weights:

    python scripts/import_torch_ckpt.py --pth ref_best.pth --window 10 \
        --out checkpoints/imported_best.ckpt
    python scripts/export_serving.py --ckpt checkpoints/imported_best.ckpt ...

--window is only needed when the .pth doesn't embed the config dict (bare
`_final.pth` state_dicts); wrapper checkpoints record it.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True, help="reference torch checkpoint")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--window", type=int, default=None,
                   help="window size (required for bare state_dicts)")
    p.add_argument("--check", action="store_true",
                   help="run one forward through the imported model")
    args = p.parse_args()

    from bridgerl_tpu.export.torch_import import (import_torch_checkpoint,
                                                  load_pth)
    from bridgerl_tpu.train.checkpoint import save_checkpoint
    from bridgerl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # also honors BRIDGERL_PLATFORM=cpu

    payload = load_pth(args.pth)
    exp, variables, meta = import_torch_checkpoint(payload, window=args.window)
    print(f"imported {exp.model.arch}+{exp.model.method} W{exp.model.window_size} "
          f"(hidden {exp.model.hidden_dim}, human {exp.model.human_input_dim} "
          f"-> robot {exp.model.robot_input_dim}) @ epoch {meta['epoch']}")

    if args.check:
        import jax
        import jax.numpy as jnp
        from bridgerl_tpu.models import init_model

        model, _ = init_model(exp.model, jax.random.key(0))
        W = exp.model.window_size
        xr = jnp.zeros((2, W, exp.model.robot_input_dim))
        xh = jnp.zeros((2, W, exp.model.human_input_dim))
        out = model.apply(variables, xr, xh, train=False)
        print(f"check ok: recon {out['robot']['recon'].shape}, "
              f"retargeted {out['human']['retargeted'].shape}")

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    save_checkpoint(args.out, epoch=meta["epoch"], variables=variables,
                    opt_state=None, best_loss=meta["best_loss"], config=exp)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
