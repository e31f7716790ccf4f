#!/bin/bash
# Round-3 stage-2 TPU queue: runs AFTER stage-1 (factorized A/B + LFQ sweep +
# FSQ arms) decided the default semantics and the quantizer fix flags.
#
# Ordered so a wall-clock cutoff mid-queue still leaves every finished step
# usable:
#   1. perf benches          — cheap-dropout sweep, multiseed vmap bench
#                              (VERDICT items 5/6 numbers; bounded duration)
#   2. cheap-dropout twin    — new-defaults arm WITHOUT cheap masks, the
#                              clean quality pair for abruns/cheap_dropout
#   3. quality-lite          — regenerate the criterion-bearing results/ rows
#                              (C2/C9/C10) under the decided flags
#   4. final bench.py line
#
# Launch with the sweep-decided flags, e.g.:
#   LFQ_FLAGS="--lfq_norm" FSQ_FLAGS="--fsq_bounded" bash scripts/run_r3_stage2.sh
set -x
cd /root/repo

python scripts/bench_sweep.py --batches 16384 --packings 8 --accums 32 \
    --cheap 0 1 2>> perf_battery.md || echo "SWEEP CHEAP FAILED"
python scripts/bench_sweep.py --batches 16384 --packings 8 --accums 16 64 \
    --cheap 1 2>> perf_battery.md || echo "SWEEP CHEAP MICRO FAILED"
python scripts/bench_multiseed.py 2>> perf_battery.md \
    || echo "BENCH MULTISEED FAILED"

mkdir -p abruns/cheap_twin
python scripts/train_ablation.py --arch transformer --method hybrid \
    --window 10 --data_dir data/dense_w10 --epochs 150 \
    --batch_size 512 --patience 20 --seed 42 --attn_packing 8 --bf16 \
    --prng rbg --save_every 25 \
    --log_dir abruns/cheap_twin/results \
    --checkpoint_dir abruns/cheap_twin/checkpoints \
    || echo "CHEAP TWIN FAILED"

LFQ_FLAGS="$LFQ_FLAGS" FSQ_FLAGS="$FSQ_FLAGS" \
    bash scripts/run_quality_r3_lite.sh

python bench.py || echo "BENCH FAILED"

echo "R3 STAGE2 DONE"
