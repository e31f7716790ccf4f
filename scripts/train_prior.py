#!/usr/bin/env python
"""Train an autoregressive prior over a trained VQ-VAE's motion tokens.

Second-stage of the VQ pipeline (net-new vs the reference, which never
consumes its indices): tokenize the full_raw robot sequences through the
checkpoint's robot encoder + quantizer, then teacher-force a causal
transformer on the code grids. The resulting prior samples NOVEL token
sequences that scripts/generate_motions.py decodes back to G1 motion.

    python scripts/train_prior.py --ckpt checkpoints/..._best.ckpt \
        --data_dir data/processed --stride 5 --epochs 300 \
        --out checkpoints/prior.ckpt
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="trained VQ-VAE checkpoint")
    p.add_argument("--data_dir", default="data/processed")
    p.add_argument("--out", default="checkpoints/prior.ckpt")
    p.add_argument("--stride", type=int, default=None,
                   help="window stride on the motion timeline (default W//2)")
    p.add_argument("--max_len", type=int, default=128,
                   help="max positions (windows) per sequence")
    p.add_argument("--phases", type=int, default=1,
                   help="corpus augmentation: tokenize each take at N evenly "
                        "spaced start offsets in [0, stride) (N independent "
                        "stride grids per take; train/val still split by "
                        "take so copies never leak across the split)")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--patience", type=int, default=30)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--ff_dim", type=int, default=512)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--slot_ar", action="store_true",
                   help="within-position slot autoregression (RQ-transformer "
                        "depth head): slot s conditions on slots < s of the "
                        "same position, curing incoherent slot combinations")
    p.add_argument("--depth_layers", type=int, default=2,
                   help="depth-transformer layers (slot_ar only)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--energy_weight", type=float, default=0.0,
                   help="exponential tilt of the train CE toward lively "
                        "windows: weight = exp(lam * standardized window "
                        "speed) (train/prior.energy_tilt_weights); 0 = off")
    p.add_argument("--scheduled_sampling", type=float, default=0.0,
                   help="max prob of replacing context positions with the "
                        "model's own samples (linear ramp; exposure-bias "
                        "mitigation, 0 = pure teacher forcing)")
    p.add_argument("--select", default="val", choices=["val", "train"],
                   help="checkpoint-selection metric: 'val' = grouped-val CE "
                   "(generalization-faithful, but returns a near-init prior "
                   "when the corpus is memorization-scale); 'train' = train "
                   "CE (generative fitting; check eval/generation novelty)")
    p.add_argument("--prng", default="threefry2x32",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"])
    p.add_argument("--labeled_dir", default=None,
                   help="dir of {action}_{i}.npz files (joint_pos key) -> "
                        "class-conditioned prior (e.g. data/raw_actions)")
    p.add_argument("--ref_normalize", action="store_true",
                   help="tokenize (x-mean)/std windows like the reference "
                        "deployment. Models TRAIN on raw windows; normalized "
                        "inputs are out-of-distribution (20x recon MSE, half "
                        "the dynamics — docs/REF_EXACT.md). Default: raw.")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    jax.config.update("jax_default_prng_impl", args.prng)
    import numpy as np

    from bridgerl_tpu.export.motion_export import (
        load_model_from_checkpoint,
        load_stats,
    )
    from bridgerl_tpu.train.prior import (
        PriorTrainConfig,
        extract_code_grids,
        save_prior_checkpoint,
        train_prior,
    )

    model, variables, exp = load_model_from_checkpoint(args.ckpt)
    W = exp.model.window_size
    stride = args.stride or max(1, W // 2)
    if args.ref_normalize:
        mean, std = load_stats(args.data_dir)
    else:
        mean, std = np.zeros(1, np.float32), np.ones(1, np.float32)

    labels = None
    if args.labeled_dir:
        # {action}_{i}.npz convention, as in the latent-analysis fixtures
        files = sorted(Path(args.labeled_dir).glob("*.npz"))
        seqs, labels = [], []
        for f in files:
            seqs.append(np.load(f)["joint_pos"].reshape(
                -1, exp.model.robot_input_dim))
            labels.append(f.stem.rsplit("_", 1)[0])
        print(f"[INFO] {len(seqs)} labeled sequences, "
              f"actions: {sorted(set(labels))}")
    else:
        full_raw = Path(args.data_dir) / "g1_train_full_raw.npy"
        if full_raw.exists():
            seqs = list(np.load(full_raw, allow_pickle=True))
        else:
            # sliced-only dataset: treat each window as a short sequence
            print("[WARN] no g1_train_full_raw.npy; falling back to sliced windows")
            seqs = list(np.load(Path(args.data_dir) / "g1_train.npy"))
    phases = sorted({round(i * stride / args.phases)
                     for i in range(args.phases)} & set(range(stride))) or [0]
    print(f"[INFO] tokenizing {len(seqs)} sequences (W={W}, stride={stride}, "
          f"phases={phases})")
    grids, mask, pcfg, seq_ids, energy = extract_code_grids(
        model, variables, exp, seqs, mean, std, stride,
        max_len=args.max_len, phases=phases, return_energy=True)
    class_ids = None
    if labels is not None:
        names = tuple(sorted(set(labels)))
        class_ids = np.asarray([names.index(labels[i]) for i in seq_ids],
                               np.int32)
        pcfg = dataclasses.replace(pcfg, class_names=names)
    pcfg = dataclasses.replace(
        pcfg, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=args.n_heads, ff_dim=args.ff_dim, dropout=args.dropout,
        slot_ar=args.slot_ar, depth_layers=args.depth_layers)
    n_tokens = int(mask.sum()) * len(pcfg.vocab_sizes)
    print(f"[INFO] {grids.shape[0]} grids, {int(mask.sum())} positions, "
          f"{n_tokens} tokens, {len(pcfg.vocab_sizes)} slots/position")

    tcfg = PriorTrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, patience=args.patience,
        seed=args.seed, select=args.select,
        scheduled_sampling=args.scheduled_sampling,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    pos_weights = None
    if args.energy_weight:
        from bridgerl_tpu.train.prior import energy_tilt_weights
        pos_weights = energy_tilt_weights(energy, mask, args.energy_weight)
        print(f"[INFO] energy tilt lam={args.energy_weight}: weight range "
              f"[{pos_weights[mask > 0].min():.3f}, "
              f"{pos_weights[mask > 0].max():.3f}]")
    best_vars, history = train_prior(grids, mask, pcfg, tcfg,
                                     class_ids=class_ids, seq_ids=seq_ids,
                                     pos_weights=pos_weights)
    save_prior_checkpoint(args.out, best_vars, pcfg, history=history)
    hist_path = str(Path(args.out).with_suffix(".history.json"))
    with open(hist_path, "w") as f:
        json.dump(history, f)
    print(f"[INFO] best val CE {min(history['val_loss']):.4f} -> {args.out}")


if __name__ == "__main__":
    main()
