#!/usr/bin/env python
"""Training-side free-run dynamics A/B: energy-tilted prior CE.

Round-4 verdict weak #3: the best *sampling* policy (guided g8 + dyn0.2)
reaches free-run vel ratio 0.331 vs the 0.93 data ceiling and the sampling
frontier is exhausted; no *training*-side lever had been tried. This script
A/Bs the exponential energy tilt (train/prior.energy_tilt_weights — fit the
prior to p(x)·e^{lam·window_speed}/Z instead of the raw empirical token
distribution) at a fixed corpus scale, over trainer seeds:

    arm = lam{L}_seed{S}: train at takes N with CE weights tilted by L,
    then evaluate with the SAME fixed sampling policies for every arm:
      - free-run unguided T1.0
      - free-run guided g8 + dyn0.2 (the adopted round-4 policy)
      - held-out prompted continuation P8 (guard: the tilt must not wreck
        continuation truth-MSE)

Success band (verdict): guided vel_ratio >= 0.5 at overlap_dis <= 0.15;
otherwise this file + docs/ROUND5.md is the negative close-out.

    python scripts/exp_prior_dynamics.py \
        --ckpt abruns/k4/checkpoints/Exp_transformer_W64_K4_hybrid_teacher_seed_42_best.ckpt \
        --takes 1280 --lams 0.0,0.75 --seeds 42,43
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
    p.add_argument("--out_dir", default="abruns/prior_dynamics")
    p.add_argument("--takes", type=int, default=1280)
    p.add_argument("--lams", default="0.0,0.75",
                   help="comma list of energy-tilt lambdas (0.0 = baseline)")
    p.add_argument("--seeds", default="42,43",
                   help="comma list of trainer seeds")
    p.add_argument("--extra_seed", type=int, default=9000,
                   help="rng seed for fresh takes (same pool recipe as "
                        "exp_prior_scaling)")
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
    p.add_argument("--guide", type=int, default=8)
    p.add_argument("--guide_dyn", type=float, default=0.2)
    p.add_argument("--select", default="val", choices=["train", "val"])
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

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
        energy_tilt_weights,
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
    mean = np.zeros(1, np.float32)
    std = np.ones(1, np.float32)

    pinned = list(np.load(Path(args.data_dir) / "g1_train_full_raw.npy",
                          allow_pickle=True))
    extra = synth_robot_takes(max(0, args.takes - len(pinned)), args.min_len,
                              args.max_len_frames, args.extra_seed)
    seqs = (pinned + extra)[:args.takes]
    print(f"[INFO] corpus: {len(seqs)} takes, W={W}", flush=True)

    phases = sorted({round(i * args.stride / args.n_phases)
                     for i in range(args.n_phases)})
    grids, mask, pcfg, ids, energy = extract_code_grids(
        model, variables, exp, seqs, mean, std, args.stride,
        max_len=args.max_len, phases=phases, return_energy=True)
    pcfg = dataclasses.replace(pcfg, slot_ar=True)
    print(f"[INFO] {grids.shape[0]} grids, {int(mask.sum())} positions",
          flush=True)

    def decode_grid_rows(grid_rows, pc):
        r, n_pos, _ = grid_rows.shape
        codes = grid_to_codes(pc, grid_rows)
        codes = denormalize_codes(exp.model, codes)
        z_q = decode_codes(exp.model, variables, codes)
        wins = model.apply(variables, z_q, method="decode_latent")
        return np.asarray(wins, np.float32).reshape(r, n_pos, W, -1)

    results_path = out / "dynamics.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})

    lams = [float(x) for x in args.lams.split(",")]
    seeds = [int(x) for x in args.seeds.split(",")]
    for seed in seeds:
        # take-grouped split is seed-dependent: rebuild the yardsticks per
        # seed (same rng recipe as train_prior)
        rng = np.random.default_rng(seed)
        takes = rng.permutation(np.unique(ids))
        n_val_takes = max(1, int(len(takes) * 0.1))
        val_takes = set(takes[:n_val_takes].tolist())
        is_val = np.asarray([int(s) in val_takes for s in ids])

        def windows_of(si):
            s = np.asarray(seqs[si], np.float32)
            return np.stack([s[i:i + W] for i in
                             range(0, s.shape[0] - W + 1, args.stride)])

        train_bank = np.concatenate(
            [windows_of(si) for si in range(len(seqs))
             if si not in val_takes and
             np.asarray(seqs[si]).shape[0] >= W])

        val_rows = np.nonzero(is_val & (mask.sum(1) >= args.positions))[0]
        if val_rows.size == 0:
            val_rows = np.nonzero(is_val & (mask.sum(1) >= 2))[0]
        sel = val_rows[np.linspace(0, val_rows.size - 1,
                                   min(args.n_samples, val_rows.size))
                       .astype(int)]
        n_pos = min(args.positions, int(mask[sel].sum(1).min()))
        true_wins = decode_grid_rows(grids[sel, :n_pos], pcfg)

        for lam in lams:
            arm = f"lam{lam:g}_seed{seed}"
            if arm in results:
                print(f"[SKIP] {arm} already done", flush=True)
                continue
            t0 = time.time()
            weights = (energy_tilt_weights(energy, mask, lam)
                       if lam else None)
            tcfg = PriorTrainConfig(
                epochs=args.epochs, patience=args.patience,
                batch_size=args.batch_size, seed=seed, select=args.select)
            best_vars, history = train_prior(
                grids, mask, pcfg, tcfg, seq_ids=ids, verbose=True,
                pos_weights=weights)
            ck = out / f"prior_{arm}.ckpt"
            save_prior_checkpoint(str(ck), best_vars, pcfg, history=history)
            prior_model, prior_vars, _ = load_prior_checkpoint(str(ck))

            rep = {
                "lam": lam, "seed": seed,
                "n_grids": int(grids.shape[0]),
                "best_train_ce": float(min(history["train_loss"])),
                "val_ce_epoch0": float(history["val_loss"][0]),
                "val_ce_best": float(min(history["val_loss"])),
                "val_ce_best_epoch": int(np.argmin(history["val_loss"])),
                "epochs_run": len(history["val_loss"]),
            }

            # the SAME two free-run policies for every arm
            for key, kw in [
                ("free_unguided", {}),
                ("free_guided", dict(guide_candidates=args.guide,
                                     guide_dyn=args.guide_dyn)),
            ]:
                ts = time.time()
                motions, wins, grid = sample_motion(
                    model, variables, exp, prior_model, prior_vars,
                    mean, std, n_samples=args.n_samples, n_positions=n_pos,
                    temperature=1.0, seed=seed,
                    return_windows=True, return_grid=True, **kw)
                free = compare_to_data(motions, seqs)
                free["overlap_disagreement"] = float(np.mean(
                    [overlap_disagreement(w, args.stride) for w in wins]))
                free.update(code_novelty(grid, grids, mask))
                free.update(nearest_data_distance(wins, train_bank))
                free["frames"] = int(sum(m.shape[0] for m in motions))
                free["sample_s"] = round(time.time() - ts, 1)
                rep[key] = free

            # held-out continuation guard (prompted P8, unguided)
            P = args.prompt_len
            _, wins_p, grid_p = sample_motion(
                model, variables, exp, prior_model, prior_vars, mean, std,
                n_samples=len(sel), n_positions=n_pos, temperature=1.0,
                seed=seed, prompt=grids[sel, :P],
                return_windows=True, return_grid=True)
            cont = wins_p[:, P:]
            pr = compare_to_data(
                [stitch_windows(w, args.stride) for w in cont], seqs)
            pr.update(code_novelty(grid_p[:, P:], grids, mask))
            pr.update(continuation_curves(cont, true_wins[:, P:],
                                          train_bank))
            rep[f"prompted_val_P{P}"] = pr

            rep["arm_s"] = round(time.time() - t0, 1)
            results[arm] = rep
            results_path.write_text(json.dumps(results, indent=1))
            fg, fu = rep["free_guided"], rep["free_unguided"]
            print(f"[ARM {arm}] val CE {rep['val_ce_best']:.3f} | "
                  f"guided vel {fg['vel_ratio']:.3f} "
                  f"overlap {fg['overlap_disagreement']:.3f} | "
                  f"unguided vel {fu['vel_ratio']:.3f} "
                  f"overlap {fu['overlap_disagreement']:.3f} | "
                  f"truth@off "
                  f"{['%.3f' % v for v in rep[f'prompted_val_P{P}']['truth_mse_by_offset'][:4]]}"
                  f" | {rep['arm_s']}s", flush=True)

    print(f"[INFO] dynamics results -> {results_path}", flush=True)


if __name__ == "__main__":
    main()
