#!/bin/bash
# Remaining quality-campaign stages after the flagship teacher (which is cut
# once converged past its parity targets; best checkpoints are saved
# continuously). Sequential: one TPU chip.
set -x
cd /root/repo

# 2. Flagship students (per-seed, from the matching teacher best)
for s in 42 1024; do
  python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
      --data_dir data/dense_w10 --mode student --epochs 400 --batch_size 1024 \
      --patience 20 --seed $s --attn_packing 8 \
      --teacher_ckpt checkpoints/Exp_transformer_W10_hybrid_teacher_seed_${s}_best.ckpt \
      || echo "STUDENT $s FAILED"
done

# 3. resnet_no_down + ae parity anchor (ref: batch 4096, early-stops ~378-428)
python scripts/train_ablation.py --arch resnet_no_down --method ae --window 10 \
    --data_dir data/dense_w10 --epochs 430 --batch_size 4096 --patience 20 \
    --seed 42 1024 --multiseed \
    || echo "RESNET_NO_DOWN FAILED"

# 4. W64 ablation grid (the published-table experiments)
for am in "simple ema" "resnet ema" "resnet rvq" "resnet fsq" "resnet lfq" "resnet hybrid"; do
  set -- $am
  python scripts/train_ablation.py --arch $1 --method $2 --window 64 \
      --data_dir data/dense_w64 --epochs 300 --batch_size 512 --patience 20 \
      --seed 42 1024 --multiseed \
      || echo "GRID $1_$2 FAILED"
done

# 5. ref-exact A/B (collapse-seed): default arm vs reference-semantics arm
for arm in default ref_exact; do
  mkdir -p abruns/$arm && cd abruns/$arm
  EXTRA=""; [ "$arm" = "ref_exact" ] && EXTRA="--ref_exact"
  python /root/repo/scripts/train_ablation.py --arch transformer --method hybrid \
      --window 10 --data_dir /root/repo/data/dense_w10 --epochs 60 \
      --batch_size 1024 --seed 1024 --attn_packing 8 $EXTRA \
      || echo "AB ARM $arm FAILED"
  cd /root/repo
done

# 6. bf16 evidence (VERDICT task 10): flagship seed 42 teacher in bf16,
#    isolated workdir, same budget class as the f32 flagship
mkdir -p abruns/bf16 && cd abruns/bf16
python /root/repo/scripts/train_ablation.py --arch transformer --method hybrid \
    --window 10 --data_dir /root/repo/data/dense_w10 --epochs 150 \
    --batch_size 512 --patience 20 --seed 42 --attn_packing 8 --bf16 \
    || echo "BF16 ARM FAILED"
cd /root/repo

echo "CAMPAIGN REST DONE"
