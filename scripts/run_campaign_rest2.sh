#!/bin/bash
# Remainder after the seed-42 student: parity anchor, grid, A/B arms, bf16.
set -x
cd /root/repo

python scripts/train_ablation.py --arch resnet_no_down --method ae --window 10 \
    --data_dir data/dense_w10 --epochs 430 --batch_size 4096 --patience 20 \
    --seed 42 1024 --multiseed \
    || echo "RESNET_NO_DOWN FAILED"

for am in "simple ema" "resnet ema" "resnet rvq" "resnet fsq" "resnet lfq" "resnet hybrid"; do
  set -- $am
  python scripts/train_ablation.py --arch $1 --method $2 --window 64 \
      --data_dir data/dense_w64 --epochs 300 --batch_size 512 --patience 20 \
      --seed 42 1024 --multiseed \
      || echo "GRID $1_$2 FAILED"
done

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

echo "CAMPAIGN REST2 DONE"
