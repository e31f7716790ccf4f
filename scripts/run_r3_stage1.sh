#!/bin/bash
# Round-3 stage-1 TPU queue (re-launched after the VM reset wiped the live
# campaign state; single-client rule — one device job at a time, chained).
#
#   1. factorized ref-exact A/B   (VERDICT item 1; 5 arms x 150 ep x 2 seeds)
#   2. cheap-dropout quality arm  (VERDICT item 6; vs round-2 abruns/bf16)
#   3. LFQ sweep                  (VERDICT item 3; 6 arms x 80 ep)
#   4. bounded-FSQ quality arms   (VERDICT item 2; flagship + grid)
#
# The default-flag decision (docs/REF_EXACT.md) happens after this queue from
# summarize_ab_factorized.py / summarize_lfq_sweep.py; the quality campaign
# (run_quality_r3.sh) and perf stage (run_perf_r3.sh) chain behind it.
set -x
cd /root/repo

bash scripts/run_ab_factorized.sh

mkdir -p abruns/cheap_dropout
python scripts/train_ablation.py --arch transformer --method hybrid \
    --window 10 --data_dir data/dense_w10 --epochs 150 \
    --batch_size 512 --patience 20 --seed 42 --attn_packing 8 --bf16 \
    --prng rbg --cheap_dropout --save_every 25 \
    --log_dir abruns/cheap_dropout/results \
    --checkpoint_dir abruns/cheap_dropout/checkpoints \
    || echo "CHEAP QUALITY ARM FAILED"

bash scripts/run_lfq_sweep.sh

bash scripts/run_fsq_arms.sh

echo "R3 STAGE1 DONE"
