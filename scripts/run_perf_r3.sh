#!/bin/bash
# Round-3 perf stage (VERDICT items 5 + 6): cheap-dropout sweep at the
# headline config, microbatch re-sweep under cheap masks, and the multiseed
# vmap benchmark. Appends to perf_battery.md. Single TPU client at a time.
set -x
cd /root/repo

# 1. uint8-bit dropout masks at the headline config (+ dropout-off ceiling,
#    + the neighboring microbatch to re-find the optimum under cheap masks)
python scripts/bench_sweep.py --batches 16384 --packings 8 --accums 32 \
    --cheap 0 1 2>> perf_battery.md \
    || echo "SWEEP CHEAP FAILED"
python scripts/bench_sweep.py --batches 16384 --packings 8 --accums 16 64 \
    --cheap 1 2>> perf_battery.md \
    || echo "SWEEP CHEAP MICRO FAILED"
python scripts/bench_sweep.py --batches 8192 --packings 8 --accums 16 \
    --cheap 1 2>> perf_battery.md \
    || echo "SWEEP CHEAP 8K FAILED"

# 2. multiseed vmap benchmark (small grid model S in {2,4,8} + flagship S=2)
python scripts/bench_multiseed.py 2>> perf_battery.md \
    || echo "BENCH MULTISEED FAILED"

# 3. cheap-dropout QUALITY arm: same config as the round-2 bf16 arm
#    (abruns/bf16: 150 epochs, batch 512, seed 42, best val_recon 0.0043) so
#    the uint8-mask flag has a direct quality comparison before any default
#    flips. Skipped when run_r3_stage1.sh already produced it.
if [ ! -f abruns/cheap_dropout/results/log_transformer_hybrid_seed_42.json ]; then
  mkdir -p abruns/cheap_dropout
  python scripts/train_ablation.py --arch transformer --method hybrid \
      --window 10 --data_dir data/dense_w10 --epochs 150 \
      --batch_size 512 --patience 20 --seed 42 --attn_packing 8 --bf16 \
      --prng rbg --cheap_dropout --save_every 25 \
      --log_dir abruns/cheap_dropout/results \
      --checkpoint_dir abruns/cheap_dropout/checkpoints \
      || echo "CHEAP QUALITY ARM FAILED"
fi

# 4. final bench line (current default config)
python bench.py || echo "BENCH FAILED"

echo "PERF R3 DONE"
