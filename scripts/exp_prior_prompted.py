#!/usr/bin/env python
"""Prompted-continuation evaluation over trained motion-token priors.

Closes the prior-coherence investigation (abruns/prior_ar): free-running
rollout from BOS produces 100%-novel slot tuples and overlap disagreement
~9x the decode ceiling at EVERY temperature/top-k — exposure bias, not
sampling noise. The committed cure is prompted continuation (sample_grids
``prompt``): anchor the rollout on a real take prefix and generate forward.

This script quantifies what prompting buys. For each prior checkpoint and
each prompt length P it anchors n_samples rollouts on HELD-OUT-take prefixes
(the take-grouped val split of the prior's own training run, reproduced from
the seed) and scores the CONTINUATION region (positions >= P) only:

- vel/jerk/coverage of the stitched continuation vs the data distribution
- overlap-disagreement RMS across the prompt->generated seam and inside the
  continuation (the coherence signal; ceiling ~0.04, free-run ~0.37)
- nn_mse to the nearest data window, overall AND per continuation offset —
  the error-compounding curve (how fast the rollout leaves the data manifold)
- divergence from the take's TRUE continuation, decoded through the same
  tokenizer (per offset; small at offset 0 + growing = anchored-but-novel,
  ~0 everywhere = verbatim copying)
- code novelty of the continuation (position/bigram tuple fractions)

P=0 rows are the free-running baseline under the identical protocol. The
reference has no generation surface at all; this is the no-reference
evaluation protocol for ours.

    python scripts/exp_prior_prompted.py \
        --ckpt abruns/k4/checkpoints/..._best.ckpt \
        --priors abruns/prior_ar/prior_ar_ph4.ckpt,abruns/prior_ar/prior_fact.ckpt
"""

import argparse
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
    p.add_argument("--out", default="abruns/prior_ar/prompted.json")
    p.add_argument("--prompt_positions", default="0,4,8,16",
                   help="comma list; 0 = free-running baseline")
    p.add_argument("--positions", type=int, default=64)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--guide_dyn", type=float, default=0.0,
                   help="dynamics-preserving guide weight (needs --guide>=2)")
    p.add_argument("--guide", type=int, default=0,
                   help="overlap-consistency guided sampling candidates "
                        "(0 = off; key rows get a |gN suffix)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--split_seed", type=int, default=42,
                   help="PriorTrainConfig.seed of the priors' training run "
                   "(reproduces the take-grouped val split for prompts)")
    p.add_argument("--val_fraction", type=float, default=0.1)
    p.add_argument("--prompt_split", default="val", choices=["val", "train"],
                   help="which takes provide prompts. 'val' (held-out) tests "
                   "generalization; 'train' is the memorization control — a "
                   "prior that fits the corpus should continue train "
                   "prefixes coherently if it learned transitions at all")
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
    from bridgerl_tpu.models.token_prior import grid_to_codes
    from bridgerl_tpu.ops.code_decode import decode_codes, denormalize_codes
    from bridgerl_tpu.train.prior import (
        extract_code_grids,
        load_prior_checkpoint,
        sample_motion,
        stitch_windows,
    )

    model, variables, exp = load_model_from_checkpoint(args.ckpt)
    mean = np.zeros(1, np.float32)  # raw pipeline (training distribution)
    std = np.ones(1, np.float32)
    seqs = list(np.load(Path(args.data_dir) / "g1_train_full_raw.npy",
                        allow_pickle=True))
    W = exp.model.window_size
    prompt_lens = [int(x) for x in args.prompt_positions.split(",")]

    def decode_grid_rows(grid_rows, pcfg):
        """(B, N, S) normalized grid -> (B, N, W, D) raw decoded windows."""
        B, N, _ = grid_rows.shape
        codes = grid_to_codes(pcfg, grid_rows)
        codes = denormalize_codes(exp.model, codes)
        z_q = decode_codes(exp.model, variables, codes)
        wins = model.apply(variables, z_q, method="decode_latent")
        return np.asarray(wins, np.float32).reshape(B, N, W, -1)

    results = {}
    cache = {}
    for prior_path in args.priors.split(","):
        prior_model, prior_vars, _ = load_prior_checkpoint(prior_path)
        name = Path(prior_path).stem
        pcfg = prior_model.cfg
        stride, max_len = pcfg.stride, pcfg.max_len
        key = (stride, max_len)
        if key not in cache:
            grids, mask, _, ids = extract_code_grids(
                model, variables, exp, seqs, mean, std, stride,
                max_len=max_len)
            data_wins = np.concatenate([
                np.stack([np.asarray(s, np.float32)[i:i + W]
                          for i in range(0, s.shape[0] - W + 1, stride)])
                for s in seqs if np.asarray(s).shape[0] >= W])
            cache[key] = (grids, mask, ids, data_wins)
        grids, mask, ids, data_wins = cache[key]

        # reproduce the priors' take-grouped val split -> held-out prompts
        rng = np.random.default_rng(args.split_seed)
        takes = rng.permutation(np.unique(ids))
        n_val_takes = max(1, int(len(takes) * args.val_fraction)) \
            if len(takes) > 1 else 0
        val_takes = set(takes[:n_val_takes].tolist())
        in_split = ((lambda s: s in val_takes) if args.prompt_split == "val"
                    else (lambda s: s not in val_takes))
        eligible = [i for i in range(grids.shape[0])
                    if in_split(int(ids[i]))
                    and int(mask[i].sum()) >= args.positions]
        if len(eligible) < args.n_samples:   # fall back to any long-enough row
            eligible = [i for i in range(grids.shape[0])
                        if int(mask[i].sum()) >= args.positions]
        sel = np.asarray(eligible)[
            np.linspace(0, len(eligible) - 1, args.n_samples).astype(int)]
        print(f"[{name}] stride={stride} val_takes={sorted(val_takes)} "
              f"prompt rows={sel.tolist()}", flush=True)
        true_wins = decode_grid_rows(grids[sel, :args.positions], pcfg)

        for P in prompt_lens:
            t0 = time.time()
            prompt = grids[sel, :P] if P > 0 else None
            motions, wins, grid = sample_motion(
                model, variables, exp, prior_model, prior_vars, mean, std,
                n_samples=args.n_samples, n_positions=args.positions,
                temperature=args.temperature, seed=args.seed, prompt=prompt,
                guide_candidates=args.guide,
                guide_dyn=args.guide_dyn,
                return_windows=True, return_grid=True)
            cont = wins[:, P:]                      # continuation windows
            cont_motions = [stitch_windows(w, stride) for w in cont]
            rep = compare_to_data(cont_motions, seqs)
            rep["overlap_disagreement_seam"] = float(np.mean(
                [overlap_disagreement(w[max(P - 1, 0):], stride)
                 for w in wins]))
            rep["overlap_disagreement_cont"] = float(np.mean(
                [overlap_disagreement(w, stride) for w in cont]))
            rep.update(code_novelty(grid[:, P:], grids, mask))
            rep.update(nearest_data_distance(cont, data_wins))
            # error-compounding curve: nn_mse + truth divergence per offset
            n_off = args.positions - P
            probe = sorted({0, 1, 2, 3, 7, 15, 31, n_off - 1} &
                           set(range(n_off)))
            rep["offsets"] = probe
            rep["nn_mse_by_offset"] = [
                nearest_data_distance(cont[:, j], data_wins)["nn_mse_mean"]
                for j in probe]
            rep["truth_mse_by_offset"] = [
                float(np.mean((cont[:, j] - true_wins[:, P + j]) ** 2))
                for j in probe]
            rep["sample_s"] = round(time.time() - t0, 1)
            row = (f"{name}|P{P}" + (f"|g{args.guide}" if args.guide else "")
                   + (f"|d{args.guide_dyn:g}" if args.guide_dyn else ""))
            results[row] = rep
            print(f"[{row}] vel {rep['vel_ratio']:.3f} | "
                  f"cov {rep['range_coverage_mean']:.2f} | "
                  f"seam {rep['overlap_disagreement_seam']:.4f} "
                  f"cont {rep['overlap_disagreement_cont']:.4f} | "
                  f"nn_mse {rep['nn_mse_mean']:.4f} | "
                  f"nn@off {['%.3f' % v for v in rep['nn_mse_by_offset']]} | "
                  f"truth@off {['%.3f' % v for v in rep['truth_mse_by_offset']]}",
                  flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():  # merge: guided/unguided passes share one file
        results = {**json.loads(out.read_text()), **results}
    out.write_text(json.dumps(results, indent=1))
    print(f"[INFO] prompted eval -> {out}", flush=True)


if __name__ == "__main__":
    main()
