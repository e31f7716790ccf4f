#!/bin/bash
# Bounded-FSQ quality arms (round-2 VERDICT item 2, follow-up to the spread
# diagnosis): the unbounded formulation's code spread is a learned attractor —
# diag_fsq_spread.py measured the project_in kernel growing 6.7x during
# training (std 0.125 -> 0.84, unique codes 5.4x nominal on the round-3
# default flagship). These arms measure what the Mentzer bound costs/buys:
#
#   flagship_bounded — transformer+hybrid W10 bf16, 150 ep, seed 42
#                      (compare: abruns/ab3/default seed-42 best 0.0064)
#   grid_fsq_bounded — resnet+fsq W64 f32, 150 ep, seed 42
#                      (compare: results/log_resnet_fsq_seed_42 best 0.0333)
set -x
cd /root/repo

mkdir -p abruns/fsqb/flagship abruns/fsqb/grid

# grid arm first: it is cheap and is the one that decides FSQ_FLAGS for the
# C2-bearing W64 regeneration (run_quality_r3_lite.sh); the flagship arm is
# the expensive confirmation that the bound doesn't hurt hybrid quality.
python scripts/train_ablation.py --arch resnet --method fsq --window 64 \
    --data_dir data/dense_w64 --epochs 150 --batch_size 512 --seed 42 \
    --save_every 25 --fsq_bounded \
    --log_dir abruns/fsqb/grid/results --checkpoint_dir abruns/fsqb/grid/checkpoints \
    || echo "FSQB GRID FAILED"

python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --data_dir data/dense_w10 --epochs 150 --batch_size 1024 --seed 42 \
    --multiseed --attn_packing 8 --bf16 --prng rbg --save_every 25 --fsq_bounded \
    --log_dir abruns/fsqb/flagship/results --checkpoint_dir abruns/fsqb/flagship/checkpoints \
    || echo "FSQB FLAGSHIP FAILED"

echo "FSQ ARMS DONE"
