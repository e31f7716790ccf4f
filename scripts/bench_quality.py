#!/usr/bin/env python
"""Perf accounting for the QUALITY flagship (round-3 VERDICT weak #6).

bench.py's headline measures the W10/K1 transformer — the perf flagship.
The measured-best *quality* recipe is the W64 K4 two-stage teacher
(val_recon 0.0037, 2x better than K1; scripts/specs_k4_2stage.json) and the
motion-token prior trainer on top of it; neither had a windows/s or tokens/s
row. This script gives both the same treatment the W10 headline gets:

- W64-K4 teacher training windows/s/chip at the recipe config (batch 512,
  attention packing 2, bf16, rbg PRNG) plus grad-accumulation variants, via
  the same bench_training harness bench.py uses (per-epoch host-value sync —
  tunneled-TPU safe).
- Prior trainer tokens/s/chip: train_prior on the pinned-64 corpus code
  grids (frozen K4 teacher, stride 32, 4 phases — the scaling-study
  protocol), timed on a SECOND call so the persistent compilation cache has
  absorbed the compile; tokens = train-split positions x S slots.

Writes abruns/bench_quality.json and prints one JSON line per arm.

    python scripts/bench_quality.py --ckpt abruns/k4/checkpoints/..._best.ckpt
"""

import argparse

import numpy as np
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="abruns/k4/checkpoints/"
                   "Exp_transformer_W64_K4_hybrid_teacher_seed_42_best.ckpt")
    p.add_argument("--data_dir", default="data/dense_w64")
    p.add_argument("--out", default="abruns/bench_quality.json")
    p.add_argument("--n_windows", type=int, default=16384)
    p.add_argument("--epochs_timed", type=int, default=4)
    p.add_argument("--prior_epochs", type=int, default=12)
    p.add_argument("--skip_teacher", action="store_true")
    p.add_argument("--skip_prior", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    from bridgerl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from bench import bench_training

    out = Path(args.out)
    results = json.loads(out.read_text()) if out.exists() else {}

    def emit(key, rep):
        results[key] = rep
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(results, indent=1))
        print(json.dumps({"arm": key, **rep}), flush=True)

    if not args.skip_teacher:
        # the recipe config + accumulation variants (microbatch is the
        # measured W10 knob; test whether it transfers to W64-K4)
        for key, kw in [
            ("k4_w64_teacher_b512_p2", dict(batch=512, accum_chunks=1)),
            ("k4_w64_teacher_b2048_micro512_p2",
             dict(batch=2048, accum_chunks=4)),
            ("k4_w64_teacher_b4096_micro512_p2",
             dict(batch=4096, accum_chunks=8)),
        ]:
            t0 = time.time()
            rates, loss = bench_training(
                window=64, tf_tokens=4, attn_packing=2,
                compute_dtype="bfloat16", n_windows=args.n_windows,
                epochs_timed=args.epochs_timed, repeats=3, **kw)
            rate = float(np.median(rates))
            emit(key, {"windows_per_sec_per_chip": round(rate, 1),
                       "median_of": len(rates),
                       "min": round(min(rates), 1),
                       "max": round(max(rates), 1),
                       "loss": round(float(loss), 4),
                       "wall_s": round(time.time() - t0, 1), **kw})

    if not args.skip_prior:
        from bridgerl_tpu.export.motion_export import (
            load_model_from_checkpoint,
        )
        from bridgerl_tpu.train.prior import (
            PriorTrainConfig,
            extract_code_grids,
            train_prior,
        )
        import dataclasses

        model, variables, exp = load_model_from_checkpoint(args.ckpt)
        seqs = list(np.load(Path(args.data_dir) / "g1_train_full_raw.npy",
                            allow_pickle=True))
        mean = np.zeros(1, np.float32)
        std = np.ones(1, np.float32)
        stride, n_phases = 32, 4
        phases = sorted({round(i * stride / n_phases)
                         for i in range(n_phases)})
        grids, mask, pcfg, ids = extract_code_grids(
            model, variables, exp, seqs, mean, std, stride,
            max_len=96, phases=phases)
        pcfg = dataclasses.replace(pcfg, slot_ar=True)
        S = grids.shape[-1]
        # select="train": no early stop, fixed epoch count for timing
        warm = PriorTrainConfig(epochs=2, batch_size=32, seed=42,
                                select="train")
        train_prior(grids, mask, pcfg, warm, seq_ids=ids, verbose=False)
        tcfg = PriorTrainConfig(epochs=args.prior_epochs, batch_size=32,
                                seed=42, select="train")
        t0 = time.time()
        _, history = train_prior(grids, mask, pcfg, tcfg, seq_ids=ids,
                                 verbose=False)
        dt = time.time() - t0
        # train split = 90% of takes; count actual trained positions
        rng = np.random.default_rng(42)
        takes = rng.permutation(np.unique(ids))
        n_val = max(1, int(len(takes) * 0.1))
        val = set(takes[:n_val].tolist())
        train_rows = np.asarray([int(s) not in val for s in ids])
        pos = int(mask[train_rows].sum())
        # train_prior is single-device (no Mesh/NamedSharding): the rate is
        # per-process, NOT divided by device_count (ADVICE r4 — dividing
        # understated it by 8x under the virtual-CPU test config)
        emit("prior_trainer_pinned64_b32", {
            "tokens_per_sec_per_chip": round(
                pos * S * args.prior_epochs / dt, 1),
            "positions_per_sec_per_chip": round(
                pos * args.prior_epochs / dt, 1),
            "n_grids": int(grids.shape[0]), "train_positions": pos,
            "slots_per_position": int(S), "epochs": args.prior_epochs,
            "wall_s": round(dt, 1),
            "final_train_ce": round(float(history["train_loss"][-1]), 4)})

    print(f"[INFO] bench_quality -> {out}", flush=True)


if __name__ == "__main__":
    main()
