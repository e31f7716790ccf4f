#!/usr/bin/env python
"""Action-conditioned prior at scale: does conditioning become real with data?

The round-3 class-token result (docs/ROUND3.md) was data-starved: 7 actions x
3 takes of 420 frames gave 4/7 exact code-space class match with near-tie
misses. The synthetic generator can label takes by construction
(data/synthetic.synth_labeled_takes: per-action latent frequency bands, the
same recipe as the pinned raw_actions fixtures but at corpus length), so this
script runs the controlled ladder the conditioned story needs: takes/class
in {3, 12, 48}, one held-out take PER CLASS (train_prior val_take_ids), and
three orthogonal readouts per arm:

- conditioning information gain: best grouped-val CE of the conditioned
  prior minus an unconditioned control trained on the identical grids/split
  (how many nats the class token is worth on held-out takes);
- prior-as-classifier accuracy on the held-out takes' grids
  (train/prior.classify_grids, argmin-CE over class tokens; chance 1/7);
- code-space histogram match of conditioned free-run samples vs the
  per-class TRAIN histograms (eval/generation.class_histogram_match — the
  committed version of the ad-hoc 4/7 readout), plus per-class dynamics
  (vel ratio vs the class's own takes).

The reference has no conditioned generation surface at all; this is the
scaling study for ours.

    python scripts/exp_prior_conditioned.py \
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
    p.add_argument("--out_dir", default="abruns/prior_cond")
    p.add_argument("--arms", default="3,12,48",
                   help="comma list of takes per class")
    p.add_argument("--take_seed", type=int, default=9100,
                   help="rng seed for the labeled takes (class streams are "
                        "superset-monotone across arms under one seed)")
    p.add_argument("--min_len", type=int, default=6000)
    p.add_argument("--max_len_frames", type=int, default=6400)
    p.add_argument("--stride", type=int, default=32)
    p.add_argument("--max_len", type=int, default=96)
    p.add_argument("--n_phases", type=int, default=4)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--patience", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--gen_per_class", type=int, default=6)
    p.add_argument("--positions", type=int, default=64)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np

    from bridgerl_tpu.data.synthetic import ACTION_BANDS, synth_labeled_takes
    from bridgerl_tpu.eval.generation import (
        class_histogram_match,
        compare_to_data,
    )
    from bridgerl_tpu.export.motion_export import load_model_from_checkpoint
    from bridgerl_tpu.train.prior import (
        PriorTrainConfig,
        classify_grids,
        extract_code_grids,
        load_prior_checkpoint,
        sample_motion,
        save_prior_checkpoint,
        train_prior,
    )

    actions = tuple(ACTION_BANDS)
    C = len(actions)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    model, variables, exp = load_model_from_checkpoint(args.ckpt)
    mean = np.zeros(1, np.float32)  # raw pipeline (training distribution)
    std = np.ones(1, np.float32)

    arm_counts = [int(x) for x in args.arms.split(",")]
    pool, labels = synth_labeled_takes(
        max(arm_counts), args.min_len, args.max_len_frames, args.take_seed,
        actions=actions)
    print(f"[INFO] pool: {len(pool)} labeled takes "
          f"({max(arm_counts)}/class x {C} classes)", flush=True)
    phases = sorted({round(i * args.stride / args.n_phases)
                     for i in range(args.n_phases)})

    results_path = out / "conditioned.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})

    for n_per in arm_counts:
        arm = f"perclass{n_per}"
        if arm in results:
            print(f"[SKIP] {arm} already done", flush=True)
            continue
        t0 = time.time()
        n_takes = n_per * C  # generator interleaves classes: [a0_0..a6_0, ...]
        seqs, labs = pool[:n_takes], labels[:n_takes]
        grids, mask, pcfg, ids = extract_code_grids(
            model, variables, exp, seqs, mean, std, args.stride,
            max_len=args.max_len, phases=phases)
        class_ids = np.asarray([actions.index(labs[i]) for i in ids],
                               np.int32)
        # one held-out take per class: the generator's first C entries are
        # exactly one take of each class, identical across arms (superset
        # class streams) — so every arm validates on the SAME takes
        val_take_ids = list(range(C))
        base = dataclasses.replace(
            pcfg, slot_ar=True, d_model=256, ff_dim=512, n_layers=4,
            n_heads=4, dropout=0.1)
        tcfg = PriorTrainConfig(epochs=args.epochs, patience=args.patience,
                                batch_size=args.batch_size, seed=args.seed,
                                select="val")
        print(f"=== {arm}: {grids.shape[0]} grids, "
              f"{int(mask.sum())} positions ===", flush=True)

        cond_cfg = dataclasses.replace(base, class_names=actions)
        cond_vars, cond_hist = train_prior(
            grids, mask, cond_cfg, tcfg, seq_ids=ids, class_ids=class_ids,
            val_take_ids=val_take_ids, verbose=True)
        ck = out / f"prior_{arm}_cond.ckpt"
        save_prior_checkpoint(str(ck), cond_vars, cond_cfg, history=cond_hist)
        prior_model, prior_vars, _ = load_prior_checkpoint(str(ck))

        uncond_vars, uncond_hist = train_prior(
            grids, mask, base, tcfg, seq_ids=ids,
            val_take_ids=val_take_ids, verbose=True)

        rep = {
            "n_takes": n_takes,
            "n_grids": int(grids.shape[0]),
            "cond_val_ce_best": float(min(cond_hist["val_loss"])),
            "cond_val_ce_epoch0": float(cond_hist["val_loss"][0]),
            "uncond_val_ce_best": float(min(uncond_hist["val_loss"])),
            "uncond_val_ce_epoch0": float(uncond_hist["val_loss"][0]),
        }
        rep["conditioning_gain_nats"] = (
            rep["uncond_val_ce_best"] - rep["cond_val_ce_best"])

        # prior-as-classifier on the held-out takes' grids (chance 1/7)
        is_val = np.isin(ids, val_take_ids)
        pred, _ = classify_grids(prior_model, prior_vars,
                                 grids[is_val], mask[is_val])
        truth = class_ids[is_val]
        rep["classifier_accuracy_val"] = float(np.mean(pred == truth))
        rep["classifier_confusion"] = {
            actions[c]: {actions[k]: int(np.sum(pred[truth == c] == k))
                         for k in range(C) if np.sum(pred[truth == c] == k)}
            for c in range(C)}
        # train-grid readout (upper bound: what the prior memorized)
        pred_tr, _ = classify_grids(prior_model, prior_vars,
                                    grids[~is_val], mask[~is_val])
        rep["classifier_accuracy_train"] = float(
            np.mean(pred_tr == class_ids[~is_val]))

        # conditioned free-run: G samples per class in ONE program
        gen_cls = np.repeat(np.arange(C, dtype=np.int32), args.gen_per_class)
        motions, wins, gen_grid = sample_motion(
            model, variables, exp, prior_model, prior_vars, mean, std,
            n_samples=len(gen_cls), n_positions=args.positions,
            temperature=args.temperature, seed=args.seed,
            class_ids=gen_cls, return_windows=True, return_grid=True)
        hm = class_histogram_match(
            gen_grid, gen_cls, grids[~is_val], class_ids[~is_val],
            cond_cfg.vocab_sizes, data_mask=mask[~is_val])
        hm["predicted"] = {actions[c]: actions[k]
                           for c, k in hm["predicted"].items()}
        hm["margins"] = {actions[c]: round(v, 4)
                         for c, v in hm["margins"].items()}
        rep["histogram_match"] = hm

        # per-class dynamics vs the class's own takes
        vel = {}
        for c in range(C):
            own = [seqs[i] for i in range(n_takes) if labs[i] == actions[c]]
            sel = [m for m, g in zip(motions, gen_cls) if g == c]
            vel[actions[c]] = round(compare_to_data(sel, own)["vel_ratio"], 3)
        rep["vel_ratio_by_class"] = vel

        rep["arm_s"] = round(time.time() - t0, 1)
        results[arm] = rep
        results_path.write_text(json.dumps(results, indent=1))
        print(f"[ARM {arm}] cond val CE {rep['cond_val_ce_best']:.3f} vs "
              f"uncond {rep['uncond_val_ce_best']:.3f} "
              f"(gain {rep['conditioning_gain_nats']:.3f} nats) | "
              f"classifier val {rep['classifier_accuracy_val']:.2f} "
              f"train {rep['classifier_accuracy_train']:.2f} | "
              f"hist match {hm['accuracy']:.2f} ({hm['n_classes']} classes) "
              f"| {rep['arm_s']}s", flush=True)

    print(f"[INFO] conditioned results -> {results_path}", flush=True)


if __name__ == "__main__":
    main()
