#!/usr/bin/env python
"""In-process batch training runner: many runs, ONE process, one device claim.

Measured on the round-3 queue: every fresh training process pays ~13 min
between exec and its first device op (tunnel/backend claim — the xla_bridge
banner appears 13-14 min after launch for every train_ablation process on a
warm worker). A 12-run campaign loses ~2.5 h to that tax; this runner pays it
once and executes a JSON list of run specs sequentially in-process, caching
datasets per data_dir and continuing past per-run failures.

Spec file: JSON list of dicts. Required: arch, method, data_dir. Optional
(defaults in parens): window (64), mode ("teacher"), seeds ([42]),
multiseed (true when len(seeds)>1), epochs (300), batch_size (512),
patience (-1), teacher_ckpt, save_every (25), attn_packing (1),
accum_chunks (1), bf16 (false), prng ("threefry2x32"), label,
log_dir ("results"), checkpoint_dir ("checkpoints"), and any
ModelConfig/TrainConfig field (torch_init, ref_exact_vel, ema_warm_start,
fsq_bounded, lfq_norm, cheap_dropout, entropy_loss_weight, ...).

Usage: python scripts/run_batch.py specs.json
"""

import dataclasses
import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_TOP = ("arch", "method", "data_dir", "window", "mode", "seeds", "multiseed",
        "bf16", "prng", "label", "log_dir", "checkpoint_dir")


def main():
    runs = json.loads(Path(sys.argv[1]).read_text())
    import jax
    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.data import PairedDataset, load_artifacts
    from bridgerl_tpu.train import MultiSeedTrainer, Trainer

    ds_cache = {}
    failures = []
    for i, r in enumerate(runs):
        label = r.get("label") or f"run{i}:{r['arch']}_{r['method']}"
        try:
            jax.config.update("jax_default_prng_impl",
                              r.get("prng", "threefry2x32"))
            dd = r["data_dir"]
            if dd not in ds_cache:
                arrays = load_artifacts(dd)
                ds_cache[dd] = PairedDataset.from_numpy(
                    arrays["g1_train.npy"], arrays["human_train.npy"])
            ds = ds_cache[dd]
            seeds = list(r.get("seeds", [42]))
            over = {k: v for k, v in r.items() if k not in _TOP}
            exp = make_experiment(
                r["arch"], r["method"], window=r.get("window", 64),
                mode=r.get("mode", "teacher"), seeds=seeds,
                human_input_dim=ds.human_dim, robot_input_dim=ds.robot_dim,
                compute_dtype="bfloat16" if r.get("bf16") else "float32",
                **dict({"epochs": 300, "batch_size": 512, "save_every": 25},
                       **over),
            )
            exp = dataclasses.replace(
                exp, log_dir=r.get("log_dir", "results"),
                checkpoint_dir=r.get("checkpoint_dir", "checkpoints"))
            print(f"=== batch[{i}] {label} start ===", flush=True)
            if r.get("multiseed", len(seeds) > 1) and len(seeds) > 1:
                MultiSeedTrainer(exp, mesh=None).run(ds)
            else:
                Trainer(exp, mesh=None).run(ds)
            print(f"=== batch[{i}] {label} OK ===", flush=True)
        except Exception as e:
            traceback.print_exc()
            failures.append(label)
            print(f"=== batch[{i}] {label} FAILED: {e} ===", flush=True)
    print(f"BATCH DONE failures={failures}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
