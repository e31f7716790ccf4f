#!/usr/bin/env python
"""Prior corpus-scaling experiment: is the coherence limit really data?

The prompted-continuation split control (docs/ROUND3.md, abruns/prior_ar/
prompted*.json) concluded the motion-token prior memorizes its 154-grid
corpus: it continues its own training takes on-manifold (nn 0.0094) but
fails held-out takes at the FIRST generated window (nn 0.19, flat ~0.4
truth divergence). This script tests that conclusion's prediction: growing
the take pool (with fresh same-distribution synthetic takes,
data/synthetic.synth_robot_takes) should move held-out continuation toward
the floors; if it doesn't, the limit is the frozen tokenizer or the
architecture, not the corpus.

Protocol per arm (take count N, superset growth — every arm contains the
pinned 64 takes): tokenize through the SAME frozen teacher (stride 32,
phases 4, slot-AR config = the measured-best ar_ph4 arm), train the prior
with the take-grouped split, then score

- grouped-val CE trajectory (epoch-0 vs best — does generalization onset?)
- free-run samples vs the arm corpus (+ novelty, nn vs TRAIN-take bank)
- held-out prompted continuation at P=8: per-offset nn/truth curves
  (eval/generation.continuation_curves) vs two floors measured per arm:
  recon_floor (decoded val-take codes vs their raw windows — the frozen
  tokenizer's generalization limit) and val_nn_floor (REAL val windows' nn
  to the train bank — what a perfectly general continuation could score).

The reference has no generative surface; this is the scaling study for ours.

    python scripts/exp_prior_scaling.py \
        --ckpt abruns/k4/checkpoints/Exp_transformer_W64_K4_hybrid_teacher_seed_42_best.ckpt
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="VQ-VAE teacher checkpoint")
    p.add_argument("--data_dir", default="data/dense_w64")
    p.add_argument("--out_dir", default="abruns/prior_scale")
    p.add_argument("--arms", default="64,160,320",
                   help="comma list of take counts (64 = pinned corpus only)")
    p.add_argument("--extra_seed", type=int, default=9000,
                   help="rng seed for the fresh takes (NOT the pinned 0)")
    p.add_argument("--min_len", type=int, default=6000)
    p.add_argument("--max_len_frames", type=int, default=6400)
    p.add_argument("--stride", type=int, default=32)
    p.add_argument("--max_len", type=int, default=96)
    p.add_argument("--n_phases", type=int, default=4)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--patience", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--positions", type=int, default=64)
    p.add_argument("--prompt_len", type=int, default=8)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--d_model", type=int, default=256,
                   help="prior width (capacity sweep at fixed corpus)")
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--prior_dropout", type=float, default=0.1)
    p.add_argument("--tag", default="",
                   help="suffix for the arm key/ckpt (e.g. _d384L6) so "
                        "capacity arms don't collide with take-count arms")
    p.add_argument("--scheduled_sampling", type=float, default=0.0,
                   help="max scheduled-sampling prob (tag the arm, e.g. "
                        "--tag _ss25)")
    p.add_argument("--factorized", action="store_true",
                   help="disable the within-position slot-AR depth head "
                        "(A/B arm — tag it, e.g. --tag _factorized)")
    p.add_argument("--select", default="train", choices=["train", "val"],
                   help="prior checkpoint selection: 'train' fits the corpus "
                        "(generative regime), 'val' early-stops on grouped-val "
                        "CE (generalization regime — the follow-up arm for "
                        "held-out continuation once val CE dips below uniform)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import numpy as np

    from bridgerl_tpu.data.synthetic import synth_robot_takes
    from bridgerl_tpu.eval.generation import (
        code_novelty,
        compare_to_data,
        continuation_curves,
        nearest_data_distance,
        overlap_disagreement,
    )
    from bridgerl_tpu.export.motion_export import load_model_from_checkpoint
    from bridgerl_tpu.models.token_prior import grid_to_codes
    from bridgerl_tpu.ops.code_decode import decode_codes, denormalize_codes
    from bridgerl_tpu.train.prior import (
        PriorTrainConfig,
        extract_code_grids,
        load_prior_checkpoint,
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

    pinned = list(np.load(Path(args.data_dir) / "g1_train_full_raw.npy",
                          allow_pickle=True))
    arm_counts = [int(x) for x in args.arms.split(",")]
    n_extra = max(arm_counts) - len(pinned)
    extra = synth_robot_takes(max(0, n_extra), args.min_len,
                              args.max_len_frames, args.extra_seed)
    pool = pinned + extra
    print(f"[INFO] pool: {len(pinned)} pinned + {len(extra)} fresh takes, "
          f"W={W}", flush=True)

    phases = sorted({round(i * args.stride / args.n_phases)
                     for i in range(args.n_phases)})

    def decode_grid_rows(grid_rows, pcfg):
        """(r, n_pos, S) normalized grid -> (r, n_pos, W, D) raw windows."""
        r, n_pos, _ = grid_rows.shape
        codes = grid_to_codes(pcfg, grid_rows)
        codes = denormalize_codes(exp.model, codes)
        z_q = decode_codes(exp.model, variables, codes)
        wins = model.apply(variables, z_q, method="decode_latent")
        return np.asarray(wins, np.float32).reshape(r, n_pos, W, -1)

    results_path = out / "scaling.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})

    for n_takes in arm_counts:
        arm = f"takes{n_takes}{args.tag}"
        if arm in results:
            print(f"[SKIP] {arm} already done", flush=True)
            continue
        t0 = time.time()
        seqs = pool[:n_takes]
        grids, mask, pcfg, ids = extract_code_grids(
            model, variables, exp, seqs, mean, std, args.stride,
            max_len=args.max_len, phases=phases)
        pcfg = dataclasses.replace(
            pcfg, slot_ar=not args.factorized, d_model=args.d_model,
            ff_dim=2 * args.d_model, n_layers=args.n_layers,
            n_heads=args.n_heads, dropout=args.prior_dropout)
        print(f"=== {arm}: {grids.shape[0]} grids, "
              f"{int(mask.sum())} positions ===", flush=True)

        tcfg = PriorTrainConfig(epochs=args.epochs, patience=args.patience,
                                batch_size=args.batch_size, seed=args.seed,
                                select=args.select,
                                scheduled_sampling=args.scheduled_sampling)
        best_vars, history = train_prior(grids, mask, pcfg, tcfg,
                                         seq_ids=ids, verbose=True)
        ck = out / f"prior_{arm}.ckpt"
        save_prior_checkpoint(str(ck), best_vars, pcfg, history=history)
        prior_model, prior_vars, _ = load_prior_checkpoint(str(ck))

        # reproduce train_prior's take-grouped split (same rng recipe)
        rng = np.random.default_rng(tcfg.seed)
        takes = rng.permutation(np.unique(ids))
        n_val_takes = max(1, int(len(takes) * tcfg.val_fraction))
        val_takes = set(takes[:n_val_takes].tolist())
        is_val = np.asarray([int(s) in val_takes for s in ids])

        # train-take window bank (val takes excluded — the nn yardstick)
        def windows_of(si):
            s = np.asarray(seqs[si], np.float32)
            return np.stack([s[i:i + W] for i in
                             range(0, s.shape[0] - W + 1, args.stride)])
        train_bank = np.concatenate(
            [windows_of(si) for si in range(n_takes)
             if si not in val_takes and
             np.asarray(seqs[si]).shape[0] >= W])
        val_wins = np.concatenate(
            [windows_of(si) for si in sorted(val_takes)
             if np.asarray(seqs[si]).shape[0] >= W])

        rep = {
            "n_grids": int(grids.shape[0]),
            "n_positions": int(mask.sum()),
            "n_val_takes": len(val_takes),
            "best_train_ce": float(min(history["train_loss"])),
            "val_ce_epoch0": float(history["val_loss"][0]),
            "val_ce_best": float(min(history["val_loss"])),
            "val_ce_best_epoch": int(np.argmin(history["val_loss"])),
            "val_ce_final": float(history["val_loss"][-1]),
            "epochs_run": len(history["val_loss"]),
        }

        # floors: frozen-tokenizer recon on val takes + real-val nn distance
        val_rows = np.nonzero(is_val &
                              (mask.sum(1) >= args.positions))[0]
        if val_rows.size == 0:
            val_rows = np.nonzero(is_val & (mask.sum(1) >= 2))[0]
        sel = val_rows[np.linspace(0, val_rows.size - 1,
                                   min(args.n_samples, val_rows.size))
                       .astype(int)]
        n_pos = min(args.positions, int(mask[sel].sum(1).min()))
        true_wins = decode_grid_rows(grids[sel, :n_pos], pcfg)

        # recon floor: a VAL take's own phase-0 windows round-tripped
        # through the frozen tokenizer (measures tokenizer generalization
        # to unseen takes; the grid rows above may carry phase/chunk
        # offsets, so re-tokenize one aligned prefix per val take)
        errs = []
        for si in sorted(val_takes)[:args.n_samples]:
            s = np.asarray(seqs[si], np.float32)
            n_w = min(args.positions, (s.shape[0] - W) // args.stride + 1)
            raw = np.stack([s[i * args.stride:i * args.stride + W]
                            for i in range(n_w)])
            g1, m1, pc1, _ = extract_code_grids(
                model, variables, exp, [s[:(n_w - 1) * args.stride + W]],
                mean, std, args.stride, max_len=n_w)
            dec = decode_grid_rows(g1[:, :n_w], pc1)[0]
            errs.append(float(np.mean((dec - raw) ** 2)))
        rep["recon_floor"] = float(np.mean(errs))
        rep["val_nn_floor"] = nearest_data_distance(
            val_wins, train_bank)["nn_mse_mean"]

        # free-run sample
        motions, wins, grid = sample_motion(
            model, variables, exp, prior_model, prior_vars, mean, std,
            n_samples=args.n_samples, n_positions=n_pos,
            temperature=args.temperature, seed=args.seed,
            return_windows=True, return_grid=True)
        free = compare_to_data(motions, seqs)
        free["overlap_disagreement"] = float(np.mean(
            [overlap_disagreement(w, args.stride) for w in wins]))
        free.update(code_novelty(grid, grids, mask))
        free.update(nearest_data_distance(wins, train_bank))
        rep["free_run"] = free

        # held-out prompted continuation
        P = args.prompt_len
        motions_p, wins_p, grid_p = sample_motion(
            model, variables, exp, prior_model, prior_vars, mean, std,
            n_samples=len(sel), n_positions=n_pos,
            temperature=args.temperature, seed=args.seed,
            prompt=grids[sel, :P], return_windows=True, return_grid=True)
        cont = wins_p[:, P:]
        pr = compare_to_data([stitch_windows(w, args.stride) for w in cont],
                             seqs)
        pr.update(code_novelty(grid_p[:, P:], grids, mask))
        pr.update(continuation_curves(cont, true_wins[:, P:], train_bank))
        rep["prompted_val_P%d" % P] = pr

        rep["arm_s"] = round(time.time() - t0, 1)
        results[arm] = rep
        results_path.write_text(json.dumps(results, indent=1))
        cc = rep["prompted_val_P%d" % P]
        print(f"[ARM {arm}] train CE {rep['best_train_ce']:.3f} "
              f"val CE {rep['val_ce_epoch0']:.3f}->{rep['val_ce_best']:.3f}"
              f"@{rep['val_ce_best_epoch']} | free vel "
              f"{free['vel_ratio']:.2f} nn {free['nn_mse_mean']:.4f} | "
              f"prompted nn@off {['%.3f' % v for v in cc['nn_mse_by_offset']]}"
              f" truth@off "
              f"{['%.3f' % v for v in cc['truth_mse_by_offset']]} | "
              f"floors recon {rep['recon_floor']:.4f} "
              f"val_nn {rep['val_nn_floor']:.4f} | {rep['arm_s']}s",
              flush=True)

    print(f"[INFO] scaling results -> {results_path}", flush=True)


if __name__ == "__main__":
    main()
