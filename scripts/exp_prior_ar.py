#!/usr/bin/env python
"""Prior-coherence A/B: factorized heads vs slot-AR (RQ-transformer) depth
head, with and without corpus phase augmentation — one process, one device
claim.

Protocol (docs/ROUND3.md generation notes): tokenize the pinned full_raw W64
takes through a trained teacher on the RAW pipeline (stride 32, max_len 96),
train each prior arm with the take-grouped split, then score generation
against the data: vel/jerk RMS ratios, range coverage, static fraction, and
the adjacent-window overlap-disagreement RMS the stitch averages away. The
decode+stitch ceiling (the data's OWN codes round-tripped) bounds what any
prior over this tokenizer can reach.

    python scripts/exp_prior_ar.py --ckpt abruns/k4/checkpoints/..._best.ckpt \
        --out_dir abruns/prior_ar
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data_dir", default="data/dense_w64")
    p.add_argument("--out_dir", default="abruns/prior_ar")
    p.add_argument("--stride", type=int, default=32)
    p.add_argument("--max_len", type=int, default=96)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--patience", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--positions", type=int, default=64)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--arms", default="fact,ar,ar_ph4",
                   help="comma list from {fact, ar, ar_ph4, fact_ph4}")
    p.add_argument("--select", default="train", choices=["train", "val"],
                   help="checkpoint selection metric. 'val' (grouped-val CE) "
                   "returns a near-init prior on this memorization-scale "
                   "corpus (val CE rises from epoch 0 — measured, "
                   "docs/ROUND3.md); 'train' fits the corpus and the novelty "
                   "metrics guard against verbatim copying")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    import numpy as np

    from bridgerl_tpu.eval.generation import (
        code_novelty,
        compare_to_data,
        format_report,
        nearest_data_distance,
        overlap_disagreement,
    )
    from bridgerl_tpu.export.motion_export import load_model_from_checkpoint
    from bridgerl_tpu.train.prior import (
        PriorTrainConfig,
        extract_code_grids,
        sample_motion,
        save_prior_checkpoint,
        stitch_windows,
        train_prior,
    )

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    model, variables, exp = load_model_from_checkpoint(args.ckpt)
    W = exp.model.window_size
    mean = np.zeros(1, np.float32)  # raw pipeline (training distribution)
    std = np.ones(1, np.float32)
    seqs = list(np.load(Path(args.data_dir) / "g1_train_full_raw.npy",
                        allow_pickle=True))
    print(f"[INFO] {len(seqs)} takes, W={W}, stride={args.stride}", flush=True)

    def tokenize(n_phases):
        phases = sorted({round(i * args.stride / n_phases)
                         for i in range(n_phases)})
        return extract_code_grids(model, variables, exp, seqs, mean, std,
                                  args.stride, max_len=args.max_len,
                                  phases=phases)

    grids1, mask1, pcfg1, ids1 = tokenize(1)
    print(f"[INFO] phases=1: {grids1.shape[0]} grids, "
          f"{int(mask1.sum())} positions, {len(pcfg1.vocab_sizes)} slots",
          flush=True)

    # ---- decode+stitch ceiling: the data's own codes, round-tripped -------
    from bridgerl_tpu.models.token_prior import grid_to_codes
    from bridgerl_tpu.ops.code_decode import decode_codes, denormalize_codes
    import jax

    def decode_grid(grid_row, n_pos):
        codes = grid_to_codes(pcfg1, grid_row[None, :n_pos])
        codes = denormalize_codes(exp.model, codes)
        z_q = decode_codes(exp.model, variables, codes)
        wins = model.apply(variables, z_q, method="decode_latent")
        return np.asarray(wins, np.float32).reshape(n_pos, W, -1)

    ceil_motions, ceil_dis, ceil_wins = [], [], []
    for i in range(min(8, grids1.shape[0])):
        n_pos = int(mask1[i].sum())
        wins = decode_grid(grids1[i], n_pos)
        ceil_motions.append(stitch_windows(wins, args.stride))
        ceil_dis.append(overlap_disagreement(wins, args.stride))
        ceil_wins.append(wins)
    ceiling = compare_to_data(ceil_motions, seqs)
    ceiling["overlap_disagreement"] = float(np.mean(ceil_dis))

    # raw data windows on the stride grid: the novelty yardstick
    data_wins = np.concatenate([
        np.stack([np.asarray(s, np.float32)[i:i + W]
                  for i in range(0, s.shape[0] - W + 1, args.stride)])
        for s in seqs if np.asarray(s).shape[0] >= W])
    # nn_mse floor: decoded DATA windows vs raw data = pure recon error, the
    # value a verbatim-copying prior would score (novelty must clear it)
    ceiling.update(nearest_data_distance(
        np.concatenate(ceil_wins), data_wins))
    print("[CEILING] data codes -> decode+stitch:", flush=True)
    print(format_report(ceiling), flush=True)
    print(f"  overlap disagreement RMS {ceiling['overlap_disagreement']:.4f}",
          flush=True)

    ARMS = {
        "fact": dict(slot_ar=False, phases=1),
        "ar": dict(slot_ar=True, phases=1),
        "ar_ph4": dict(slot_ar=True, phases=4),
        "fact_ph4": dict(slot_ar=False, phases=4),
    }
    summary = {"ceiling": {k: v for k, v in ceiling.items()},
               "arms": {}}
    for arm in args.arms.split(","):
        spec = ARMS[arm]
        t0 = time.time()
        if spec["phases"] == 1:
            grids, mask, pcfg, ids = grids1, mask1, pcfg1, ids1
        else:
            grids, mask, pcfg, ids = tokenize(spec["phases"])
        pcfg = dataclasses.replace(pcfg, slot_ar=spec["slot_ar"])
        tcfg = PriorTrainConfig(epochs=args.epochs, patience=args.patience,
                                batch_size=args.batch_size, seed=args.seed,
                                select=args.select)
        print(f"=== arm {arm}: {grids.shape[0]} grids, slot_ar="
              f"{spec['slot_ar']} ===", flush=True)
        best_vars, history = train_prior(grids, mask, pcfg, tcfg,
                                         seq_ids=ids, verbose=True)
        ck = out / f"prior_{arm}.ckpt"
        save_prior_checkpoint(str(ck), best_vars, pcfg, history=history)

        from bridgerl_tpu.train.prior import load_prior_checkpoint
        prior_model, prior_vars, _ = load_prior_checkpoint(str(ck))
        motions, windows, gen_grid = sample_motion(
            model, variables, exp, prior_model, prior_vars, mean, std,
            n_samples=args.n_samples, n_positions=args.positions,
            temperature=args.temperature, seed=args.seed,
            return_windows=True, return_grid=True)
        rep = compare_to_data(motions, seqs)
        rep["overlap_disagreement"] = float(np.mean(
            [overlap_disagreement(w, args.stride) for w in windows]))
        rep.update(code_novelty(gen_grid, grids, mask))
        rep.update(nearest_data_distance(windows, data_wins))
        rep["best_val_ce"] = float(min(history["val_loss"]))
        rep["best_train_ce"] = float(min(history["train_loss"]))
        rep["epochs_run"] = len(history["val_loss"])
        rep["train_s"] = round(time.time() - t0, 1)
        summary["arms"][arm] = rep
        for i, m in enumerate(motions):
            np.save(out / f"gen_{arm}_idx{i}.npy", m)
        print(f"[ARM {arm}] train CE {rep['best_train_ce']:.3f} "
              f"val CE {rep['best_val_ce']:.3f} | "
              f"vel ratio {rep['vel_ratio']:.3f} | "
              f"coverage {rep['range_coverage_mean']:.2f} | "
              f"overlap dis {rep['overlap_disagreement']:.4f} | "
              f"novel pos {rep['position_novel_frac']:.2f} "
              f"bigram {rep['bigram_novel_frac']:.2f} | "
              f"nn_mse {rep['nn_mse_mean']:.4f} | "
              f"{rep['train_s']}s", flush=True)

    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(f"[INFO] summary -> {out / 'summary.json'}", flush=True)


if __name__ == "__main__":
    main()
