#!/bin/bash
# Round-2 quality campaign (VERDICT tasks 1, 2, 6): converge the flagship,
# the resnet_no_down parity anchor, and the full W64 ablation grid at
# reference-scale epochs on the dense synthetic datasets, then the ref-exact
# A/B arm. Sequential: one TPU chip.
set -x
cd /root/repo

# 1. Flagship teacher: transformer+hybrid W10, both round-1 seeds, ref batch 512
python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --data_dir data/dense_w10 --epochs 500 --batch_size 512 --patience 20 \
    --seed 42 1024 --multiseed --attn_packing 8 \
    || echo "FLAGSHIP TEACHER FAILED"

# 2. Flagship students (per-seed, from the matching teacher best)
for s in 42 1024; do
  python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
      --data_dir data/dense_w10 --mode student --epochs 600 --batch_size 1024 \
      --patience 20 --seed $s --attn_packing 8 \
      --teacher_ckpt checkpoints/Exp_transformer_W10_hybrid_teacher_seed_${s}_best.ckpt \
      || echo "STUDENT $s FAILED"
done

# 3. resnet_no_down + ae parity anchor (ref: batch 4096, early-stops ~378-428)
python scripts/train_ablation.py --arch resnet_no_down --method ae --window 10 \
    --data_dir data/dense_w10 --epochs 430 --batch_size 4096 --patience 20 \
    --seed 42 1024 --multiseed \
    || echo "RESNET_NO_DOWN FAILED"

# 4. W64 ablation grid (the published-table experiments; conv archs cannot
#    round-trip W10 — same property as the reference's stride-2 convs)
for am in "simple ema" "resnet ema" "resnet rvq" "resnet fsq" "resnet lfq" "resnet hybrid"; do
  set -- $am
  python scripts/train_ablation.py --arch $1 --method $2 --window 64 \
      --data_dir data/dense_w64 --epochs 400 --batch_size 512 --patience 20 \
      --seed 42 1024 --multiseed \
      || echo "GRID $1_$2 FAILED"
done

# 5. ref-exact A/B (collapse-seed): default arm vs reference-semantics arm.
#    Isolated workdirs — artifact names would otherwise clobber the flagship.
for arm in default ref_exact; do
  mkdir -p abruns/$arm && cd abruns/$arm
  EXTRA=""; [ "$arm" = "ref_exact" ] && EXTRA="--ref_exact"
  python /root/repo/scripts/train_ablation.py --arch transformer --method hybrid \
      --window 10 --data_dir /root/repo/data/dense_w10 --epochs 60 \
      --batch_size 1024 --seed 1024 --attn_packing 8 $EXTRA \
      || echo "AB ARM $arm FAILED"
  cd /root/repo
done

echo "CAMPAIGN DONE"
