#!/usr/bin/env python
"""Freeze a trained checkpoint into a self-contained StableHLO serving
artifact (and optionally smoke-test it back).

The reference has no serving path — its deployment scripts re-import the
model class and torch checkpoint on every host (reference
scripts/deployment/export_motion.py:112-151). The artifact produced here
runs on plain jax with no bridgerl_tpu import, any batch size, cpu or tpu.

    python scripts/export_serving.py --ckpt ckpts/..._best.ckpt \
        --out serving/flagship.zip --data_dir data/processed --check
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--out", type=str, required=True, help="output .zip path")
    p.add_argument("--data_dir", type=str, default="./data/processed",
                   help="normalization stats source (mean/std npy)")
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and run a 2-window smoke batch")
    p.add_argument("--prior", type=str, default=None,
                   help="token-prior checkpoint: export a GENERATOR artifact "
                        "(key -> novel motion) instead of the retargeter")
    p.add_argument("--positions", type=int, default=32,
                   help="generator: windows per sampled motion")
    p.add_argument("--num", type=int, default=4,
                   help="generator: motions per call")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--guide_dyn", type=float, default=0.0,
                   help="generator: dynamics-preserving guide weight")
    p.add_argument("--guide", type=int, default=0,
                   help="generator: overlap-consistency guided sampling "
                        "candidates per position (0/1 = off)")
    p.add_argument("--ref_normalize", action="store_true",
                   help="bake (x-mean)/std normalization into the frozen "
                        "graph like the reference deployment. Models TRAIN "
                        "on raw windows — normalized inputs are out-of-"
                        "distribution (20x recon MSE, half the dynamics; "
                        "docs/REF_EXACT.md). Default: raw in, raw out.")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from bridgerl_tpu.export import export_serving_artifact, load_serving_artifact
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())

    if args.prior:
        from bridgerl_tpu.export.serialize import export_generator_artifact
        meta = export_generator_artifact(
            args.ckpt, args.prior, args.out, data_dir=args.data_dir,
            n_positions=args.positions, n_samples=args.num,
            temperature=args.temperature, top_k=args.top_k,
            guide_candidates=args.guide,
            guide_dyn=args.guide_dyn,
            platforms=platforms, ref_normalize=args.ref_normalize)
    else:
        meta = export_serving_artifact(
            args.ckpt, args.out, data_dir=args.data_dir, platforms=platforms,
            ref_normalize=args.ref_normalize)
    for name, sig in meta["functions"].items():
        print(f"  {name}: {sig['input']} -> {sig['output']}")
    print(f"wrote {args.out} (platforms={meta['platforms']})")

    if args.check:
        import numpy as np
        mod = load_serving_artifact(args.out)
        if args.prior:
            name = sorted(mod.fns)[0]
            action = name[len("generate_"):] if name != "generate" else None
            out = np.asarray(mod.generate(0, action=action))
            assert np.all(np.isfinite(out)), "non-finite generator output"
            print(f"check ok: {name}(seed=0) -> {tuple(out.shape)}")
        else:
            W = mod.window_size
            h_dim = mod.meta["functions"]["retarget"]["input"][2]
            out = mod.retarget(np.zeros((2, W, h_dim), np.float32))
            assert np.all(np.isfinite(np.asarray(out))), "non-finite serving output"
            print(f"check ok: retarget (2, {W}, {h_dim}) -> {tuple(out.shape)}")


if __name__ == "__main__":
    main()
