#!/bin/bash
# Chained TPU queue after the factorized A/B (single-client rule: the tunneled
# worker wedges under concurrent claims — one device job at a time).
set -x
cd /root/repo

AB_PID=$1
if [ -n "$AB_PID" ]; then
  while kill -0 "$AB_PID" 2>/dev/null; do sleep 30; done
fi

# 1. deferred /verify TPU drive (same recipe as the CPU pass, on the chip)
WS=$(mktemp -d)
pushd $WS
python /root/repo/scripts/process_data.py --synthetic --window 10 --step 2 --n_sequences 8
python /root/repo/scripts/train_ablation.py --arch resnet_no_down --method ae \
    --window 10 --epochs 3 --batch_size 256 --seed 42
python /root/repo/scripts/train_ablation.py --arch resnet_no_down --method ae \
    --window 10 --mode student --epochs 2 --batch_size 256 --seed 42 \
    --teacher_ckpt checkpoints/Exp_resnet_no_down_W10_ae_teacher_seed_42_best.ckpt
python /root/repo/scripts/export_motion.py \
    --ckpt checkpoints/Exp_resnet_no_down_W10_ae_teacher_seed_42_best.ckpt --num_samples 2
echo TPU_E2E_OK workspace=$WS
popd

# 2. LFQ sweep (6 arms x 80 epochs, seed 42)
bash scripts/run_lfq_sweep.sh

# 3. W64 transformer+hybrid teacher (parity row C10), 2 seeds multiseed
python scripts/train_ablation.py --arch transformer --method hybrid --window 64 \
    --data_dir data/dense_w64 --epochs 300 --batch_size 512 --patience 30 \
    --seed 42 1024 --multiseed --attn_packing 2 \
    || echo "W64 TRANSFORMER FAILED"

echo "AFTER_AB QUEUE DONE"
