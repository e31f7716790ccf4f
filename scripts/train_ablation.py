#!/usr/bin/env python
"""Multi-seed ablation training driver.

CLI twin of reference scripts/train_ablation.py:374-437 with the same flags
(--mode teacher|student --arch --method --window --epochs --batch_size --seed
[s...] --patience --resume --teacher_ckpt) plus TPU-specific ones:

--multiseed      train all seeds simultaneously under one vmapped jit
                 (replaces the reference's size-1 process pool)
--data_parallel  shard the batch over all local devices (replaces DataParallel;
                 the reference's --force_multi_gpu is accepted as an alias)
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--method", type=str, default="hybrid")
    p.add_argument("--arch", type=str, default="transformer")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--seed", type=int, nargs="+", default=[42])
    p.add_argument("--window", type=int, default=64)
    p.add_argument("--patience", type=int, default=-1)
    p.add_argument("--mode", type=str, default="teacher", choices=["teacher", "student"])
    p.add_argument("--resume", action="store_true")
    p.add_argument("--teacher_ckpt", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="data/processed")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--tf_tokens", type=int, default=1,
                   help="Transformer latent tokens per window (chunked mean "
                        "pools; 1 = reference single-token bottleneck). Must "
                        "divide --window.")
    p.add_argument("--multiseed", action="store_true",
                   help="vmap all seeds into one XLA program")
    p.add_argument("--data_parallel", "--force_multi_gpu", action="store_true",
                   dest="data_parallel", help="shard batch over all devices")
    p.add_argument("--lambda_fk", type=float, default=0.0,
                   help="World-space FK loss weight (teacher stage)")
    p.add_argument("--profile", type=str, default=None,
                   help="jax.profiler trace directory (wraps the whole run)")
    p.add_argument("--accum_chunks", type=int, default=1,
                   help="Split each optimizer batch into N sequential "
                        "microbatches (summed grads, one optimizer step): "
                        "identical gradients, 1/N the live activation memory "
                        "— lets 8k-16k global batches run at the 4k rate")
    p.add_argument("--attn_packing", type=int, default=1,
                   help="Pack P windows per attention call (block-diag mask; "
                        "math-identical, big MXU win for small windows)")
    p.add_argument("--fused_attention", action="store_true",
                   help="Pallas fused attention core (VMEM-resident logits; "
                        "same param tree, flash-style custom VJP)")
    p.add_argument("--prng", type=str, default="threefry2x32",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"],
                   help="PRNG impl; rbg is ~25%% faster on TPU (dropout masks)")
    p.add_argument("--ref_exact", action="store_true",
                   help="Flip all documented deviations to reference semantics "
                        "(channel-axis velocity diff, torch kernel inits, cold "
                        "EMA-state init) for A/B runs — see docs/REF_EXACT.md")
    p.add_argument("--torch_init", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="torch kaiming/xavier-uniform kernel inits (config "
                        "default True since the round-3 A/B measured -11.6% "
                        "best val_recon; --no-torch_init = lecun-normal, the "
                        "pre-round-3 regime; docs/REF_EXACT.md)")
    p.add_argument("--cold_ema", action="store_true",
                   help="Single-flag A/B arm: reference cold EMA-state init "
                        "only (normal ema_w, zero cluster sizes; the one "
                        "deviation KEPT after the round-3 A/B — neutral at "
                        "this regime, pathological at large batch)")
    p.add_argument("--ref_exact_vel", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="channel-axis velocity diff, the reference's exact "
                        "semantics (config default True since the round-3 A/B "
                        "measured -8.4%; --no-ref_exact_vel = time-axis)")
    p.add_argument("--log_dir", type=str, default="results",
                   help="History JSON directory (A/B arms redirect this)")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype (f32 master weights + codebook math)")
    p.add_argument("--fsq_bounded", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Mentzer-style FSQ bounding (tanh-squash to exactly "
                        "prod(levels) codes; config default True since the "
                        "round-3 arm measured it better with the reference's "
                        "published DCR~0 signature); --no-fsq_bounded "
                        "restores the reference's unbounded round")
    p.add_argument("--save_every", type=int, default=1,
                   help="Epochs between `_last` checkpoint writes (device->"
                        "host state pulls cost seconds/epoch on the tunneled "
                        "TPU; resume granularity trades against throughput)")
    p.add_argument("--cheap_dropout", action="store_true",
                   help="uint8-bit dropout masks (8 PRNG bits/element; keep "
                        "prob quantized to 1/256) — measured mask-gen cost "
                        "cure, see perf_battery.md")
    p.add_argument("--int8_ff", action="store_true",
                   help="int8 MXU forward for the transformer FF matmuls "
                        "(straight-through bf16 backward; ops/int8.py)")
    p.add_argument("--reuse_dropout_mask", action="store_true",
                   help="One dropout mask per optimizer batch, shared across "
                        "accumulation microbatches (XLA hoists the PRNG work "
                        "out of the microbatch scan; see config.py)")
    p.add_argument("--lfq_norm", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="LFQ pre-sign LayerNorm (stops the measured STE scale "
                        "runaway, see diag_lfq.py; config default True since "
                        "the round-3 sweep: 0.2703/PPL 33 -> 0.0562/PPL 981); "
                        "--no-lfq_norm restores reference semantics")
    p.add_argument("--entropy_weight", type=float, default=0.1,
                   help="LFQ entropy regularization weight (reference 0.1)")
    p.add_argument("--init_from", type=str, default=None,
                   help="Transfer-init checkpoint path (or '{seed}' pattern): "
                        "matching leaves initialize this run, the rest stay "
                        "fresh (e.g. ae-pretrained encoders into hybrid)")
    p.add_argument("--vq_norm", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Pre-quantizer LayerNorm (parameter-free, both "
                        "branches): removes the latent common-mode so EMA "
                        "codes track per-window structure (W64-transformer "
                        "collapse cure; models/dual_vqvae.py)")
    p.add_argument("--codebook_data_init", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Seed first-stage EMA codebooks from encoder outputs "
                        "on a real batch before training (VQ-VAE-2-style data "
                        "init; cures the measured W64-transformer PPL=1 "
                        "winner-take-all collapse — train/codebook_seed.py)")
    args = p.parse_args()

    if args.prng != "threefry2x32":
        import jax as _jax
        _jax.config.update("jax_default_prng_impl", args.prng)

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.data import PairedDataset, load_artifacts
    from bridgerl_tpu.parallel import make_mesh
    from bridgerl_tpu.train import MultiSeedTrainer, Trainer

    arrays = load_artifacts(args.data_dir)
    ds = PairedDataset.from_numpy(arrays["g1_train.npy"], arrays["human_train.npy"])
    print(f"Dataset loaded. Dim: R={ds.robot_dim}/H={ds.human_dim}, "
          f"N={len(ds)}, Batch={args.batch_size}")

    # tri-state CLI switches (None = inherit the config default)
    opt = {k: v for k, v in
           (("fsq_bounded", args.fsq_bounded), ("lfq_norm", args.lfq_norm),
            ("codebook_data_init", args.codebook_data_init),
            ("vq_norm", args.vq_norm))
           if v is not None}
    exp = make_experiment(
        args.arch, args.method, window=args.window, mode=args.mode,
        seeds=tuple(args.seed), epochs=args.epochs, batch_size=args.batch_size,
        patience=args.patience, resume=args.resume, teacher_ckpt=args.teacher_ckpt,
        init_from=args.init_from,
        save_every=args.save_every,
        learning_rate=args.lr, hidden_dim=args.hidden_dim, lambda_fk=args.lambda_fk,
        tf_tokens=args.tf_tokens,
        attn_packing=args.attn_packing, accum_chunks=args.accum_chunks,
        fused_attention=args.fused_attention,
        cheap_dropout=args.cheap_dropout,
        int8_ff=args.int8_ff,
        reuse_dropout_mask=args.reuse_dropout_mask,
        entropy_loss_weight=args.entropy_weight,
        human_input_dim=ds.human_dim, robot_input_dim=ds.robot_dim,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        **opt,
    )
    import dataclasses as _dc
    if args.log_dir != "results" or args.checkpoint_dir != "checkpoints":
        exp = _dc.replace(exp, log_dir=args.log_dir, checkpoint_dir=args.checkpoint_dir)
    if args.ref_exact:
        from bridgerl_tpu.config import ref_exact
        exp = ref_exact(exp)
        print("!!! ref-exact mode: channel-axis velocity diff, torch inits, "
              "cold EMA init !!!")
    else:
        # single-flag arms for the factorized A/B (round-2 VERDICT item 1)
        model_over, train_over = {}, {}
        if args.torch_init is not None and args.torch_init != exp.model.torch_init:
            model_over["torch_init"] = args.torch_init
        if args.cold_ema:
            model_over["ema_warm_start"] = False
        if (args.ref_exact_vel is not None
                and args.ref_exact_vel != exp.train.ref_exact_vel):
            train_over["ref_exact_vel"] = args.ref_exact_vel
        if model_over or train_over:
            exp = _dc.replace(
                exp,
                model=_dc.replace(exp.model, **model_over),
                train=_dc.replace(exp.train, **train_over))
            print(f"!!! single-flag arm(s): {sorted({**model_over, **train_over})} !!!")

    mesh = make_mesh() if args.data_parallel and jax.device_count() > 1 else None
    if mesh is not None:
        # scale the global batch by device count, mirroring the reference's
        # DataParallel behavior (train_ablation.py:325-328)
        scaled = args.batch_size * jax.device_count()
        print(f"!!! Data-parallel over {jax.device_count()} devices; "
              f"scaling batch size to {scaled} !!!")
        import dataclasses
        exp = dataclasses.replace(exp, train=dataclasses.replace(exp.train, batch_size=scaled))

    from bridgerl_tpu.utils import trace

    with trace(args.profile):
        if args.multiseed and len(args.seed) > 1:
            MultiSeedTrainer(exp, mesh=mesh).run(ds)
        else:
            Trainer(exp, mesh=mesh).run(ds)
    for seed in args.seed:
        print(f"Success: {exp.name} | Mode: {args.mode} | Seed: {seed}")


if __name__ == "__main__":
    main()
