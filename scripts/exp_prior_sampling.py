#!/usr/bin/env python
"""Sampling-hyperparameter sweep over trained motion-token priors.

Retraining-free follow-on to scripts/exp_prior_ar.py: load the teacher + the
saved prior checkpoints, sweep temperature x top_k on the SAME generation
protocol (n samples, positions, seed), and score each point with the
generation statistics (vel/jerk RMS ratios, range coverage, static fraction)
plus the adjacent-window overlap-disagreement RMS. The decode+stitch ceiling
from exp_prior_ar bounds every point; sampling knobs only move where the
prior puts its probability mass, so this isolates "bad sampling" from "bad
prior" — the factorization A/B changes the prior, this sweep changes only
the draw.

    python scripts/exp_prior_sampling.py \
        --ckpt abruns/k4/checkpoints/..._best.ckpt \
        --priors abruns/prior_ar/prior_ar.ckpt \
        --temperatures 0.8,0.9,1.0 --top_ks 0,8,32
"""

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="VQ-VAE teacher checkpoint")
    p.add_argument("--priors", required=True,
                   help="comma list of prior checkpoints")
    p.add_argument("--data_dir", default="data/dense_w64")
    p.add_argument("--out", default="abruns/prior_ar/sampling_sweep.json")
    p.add_argument("--temperatures", default="0.8,0.9,1.0")
    p.add_argument("--top_ks", default="0,8,32",
                   help="0 = no top-k truncation")
    p.add_argument("--top_ps", default="0",
                   help="0 = no nucleus filtering (composes with top_k)")
    p.add_argument("--guide_dyns", default="0",
                   help="comma list of dynamics-preserving guide weights "
                        "(sample_grids_guided dyn_weight; needs --guides>=2)")
    p.add_argument("--guides", default="0",
                   help="overlap-consistency guided sampling candidate "
                        "counts (0 = off; e.g. 0,4,16)")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--positions", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    from bridgerl_tpu.eval.generation import (
        code_novelty,
        compare_to_data,
        nearest_data_distance,
        overlap_disagreement,
    )
    from bridgerl_tpu.export.motion_export import load_model_from_checkpoint
    from bridgerl_tpu.train.prior import (
        extract_code_grids,
        load_prior_checkpoint,
        sample_motion,
    )

    model, variables, exp = load_model_from_checkpoint(args.ckpt)
    mean = np.zeros(1, np.float32)  # raw pipeline (training distribution)
    std = np.ones(1, np.float32)
    seqs = list(np.load(Path(args.data_dir) / "g1_train_full_raw.npy",
                        allow_pickle=True))
    temps = [float(t) for t in args.temperatures.split(",")]
    top_ks = [int(k) for k in args.top_ks.split(",")]
    top_ps = [float(x) for x in args.top_ps.split(",")]
    guides = [int(x) for x in args.guides.split(",")]
    guide_dyns = [float(x) for x in args.guide_dyns.split(",")]

    sweep = {}
    data_grids = data_mask = data_wins = None
    for prior_path in args.priors.split(","):
        prior_model, prior_vars, _ = load_prior_checkpoint(prior_path)
        name = Path(prior_path).stem
        stride = prior_model.cfg.stride
        if data_grids is None:
            # novelty yardsticks (phase-0 stride grid, same for every prior
            # trained on this teacher/stride)
            W = exp.model.window_size
            data_grids, data_mask, _, _ = extract_code_grids(
                model, variables, exp, seqs, mean, std, stride,
                max_len=prior_model.cfg.max_len)
            data_wins = np.concatenate([
                np.stack([np.asarray(s, np.float32)[i:i + W]
                          for i in range(0, s.shape[0] - W + 1, stride)])
                for s in seqs if np.asarray(s).shape[0] >= W])
        grid_points = [(temp, tk, tp, gd, gw)
                       for temp, tk, tp, gd in itertools.product(
                           temps, top_ks, top_ps, guides)
                       for gw in (guide_dyns if gd else [0.0])]
        for temp, tk, tp, gd, gw in grid_points:
            t0 = time.time()
            motions, windows, grid = sample_motion(
                model, variables, exp, prior_model, prior_vars,
                mean, std, n_samples=args.n_samples,
                n_positions=args.positions, temperature=temp,
                top_k=(tk or None), top_p=(tp or None), seed=args.seed,
                guide_candidates=gd, guide_dyn=gw,
                return_windows=True, return_grid=True)
            rep = compare_to_data(motions, seqs)
            rep["overlap_disagreement"] = float(np.mean(
                [overlap_disagreement(w, stride) for w in windows]))
            rep.update(code_novelty(grid, data_grids, data_mask))
            rep.update(nearest_data_distance(windows, data_wins))
            rep["sample_s"] = round(time.time() - t0, 1)
            key = (f"{name}|T{temp}|k{tk}" + (f"|p{tp}" if tp else "")
                   + (f"|g{gd}" if gd else "")
                   + (f"|d{gw:g}" if gw else ""))
            sweep[key] = rep
            print(f"[{key}] vel {rep['vel_ratio']:.3f} | "
                  f"jerk {rep['jerk_ratio']:.3f} | "
                  f"cov {rep['range_coverage_mean']:.2f} | "
                  f"overlap {rep['overlap_disagreement']:.4f} | "
                  f"novel pos {rep['position_novel_frac']:.2f} "
                  f"bigram {rep['bigram_novel_frac']:.2f} | "
                  f"nn_mse {rep['nn_mse_mean']:.4f}",
                  flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():  # merge: sweep passes accumulate into one file
        sweep = {**json.loads(out.read_text()), **sweep}
    out.write_text(json.dumps(sweep, indent=1))
    print(f"[INFO] sweep -> {out}", flush=True)


if __name__ == "__main__":
    main()
