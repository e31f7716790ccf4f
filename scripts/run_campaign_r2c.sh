#!/bin/bash
# Round-2 session-2 campaign: the VM reset wiped untracked state (data/,
# checkpoints/, abruns/), so every run that feeds results/ or derived
# artifacts is redone on the pinned regenerated datasets
# (scripts/gen_datasets.py — seeded, committed, reproducible).
# Sequential: one TPU chip. Value order: flagship first.
set -x
cd /root/repo

# 0. datasets (no-op if present)
[ -f data/dense_w10/g1_train.npy ] || python scripts/gen_datasets.py

# 1. Flagship teacher: transformer+hybrid W10, both seeds, one vmapped program
python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --data_dir data/dense_w10 --epochs 340 --batch_size 512 --patience 20 \
    --seed 42 1024 --multiseed --attn_packing 8 \
    || echo "FLAGSHIP TEACHER FAILED"

# 2. Flagship student (seed 42, from the matching teacher best)
python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --data_dir data/dense_w10 --mode student --epochs 300 --batch_size 1024 \
    --patience 20 --seed 42 --attn_packing 8 \
    --teacher_ckpt checkpoints/Exp_transformer_W10_hybrid_teacher_seed_42_best.ckpt \
    || echo "STUDENT 42 FAILED"

# 3. resnet_no_down + ae parity anchor (ref: batch 4096, early-stops ~378-428)
python scripts/train_ablation.py --arch resnet_no_down --method ae --window 10 \
    --data_dir data/dense_w10 --epochs 430 --batch_size 4096 --patience 20 \
    --seed 42 1024 --multiseed \
    || echo "RESNET_NO_DOWN FAILED"

# 4. W64 ablation grid (published-table experiments)
for am in "simple ema" "resnet ema" "resnet rvq" "resnet fsq" "resnet lfq" "resnet hybrid"; do
  set -- $am
  python scripts/train_ablation.py --arch $1 --method $2 --window 64 \
      --data_dir data/dense_w64 --epochs 300 --batch_size 512 --patience 20 \
      --seed 42 1024 --multiseed \
      || echo "GRID $1_$2 FAILED"
done

# 5. ref-exact A/B arms (collapse-seed 1024) + bf16 evidence arm
for arm in default ref_exact; do
  mkdir -p abruns/$arm && cd abruns/$arm
  EXTRA=""; [ "$arm" = "ref_exact" ] && EXTRA="--ref_exact"
  python /root/repo/scripts/train_ablation.py --arch transformer --method hybrid \
      --window 10 --data_dir /root/repo/data/dense_w10 --epochs 60 \
      --batch_size 1024 --seed 1024 --attn_packing 8 $EXTRA \
      || echo "AB ARM $arm FAILED"
  cd /root/repo
done
mkdir -p abruns/bf16 && cd abruns/bf16
python /root/repo/scripts/train_ablation.py --arch transformer --method hybrid \
    --window 10 --data_dir /root/repo/data/dense_w10 --epochs 150 \
    --batch_size 512 --patience 20 --seed 42 --attn_packing 8 --bf16 \
    || echo "BF16 ARM FAILED"
cd /root/repo

# 6. Derived artifacts from the converged runs
python scripts/plot_results.py
python scripts/export_latex_table.py > results/ablation_table.tex
python scripts/check_parity.py || true
python scripts/summarize_ab.py > docs/AB_ARMS.md || true
python scripts/export_motion.py \
    --ckpt checkpoints/Exp_transformer_W10_hybrid_teacher_seed_42_best.ckpt \
    --num_samples 3 --data_dir data/dense_w10
python scripts/play_g1_npy.py \
    --input_file motions/recon_transformer_FullSeq_W10_idx0.npy \
    --render plots/replay_flagship.gif
python scripts/analyze_latent_space.py --raw_dir data/raw_actions \
    --data_dir data/dense_w10 \
    --ckpt checkpoints/Exp_transformer_W10_hybrid_teacher_seed_42_best.ckpt || true
python scripts/analyze_latent_space.py --raw_dir data/raw_actions \
    --data_dir data/dense_w10 \
    --ckpt checkpoints/Exp_transformer_W10_hybrid_student_seed_42_best.ckpt || true

echo "CAMPAIGN R2C DONE"
