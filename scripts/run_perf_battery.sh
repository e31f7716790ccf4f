#!/bin/bash
# Round-2 perf battery (VERDICT task 3): run on an idle chip.
set -x
cd /root/repo

# 1. cost analysis + per-step timing at the three batch points
for b in 4096 8192 16384; do
  python scripts/profile_step.py --batch $b | tee -a perf_battery.log
done

# 2. packing sweep at the two big batches
python scripts/bench_sweep.py --batches 8192 16384 --packings 8 16 32 \
    --epochs_timed 4 2>>perf_battery.md | tee -a perf_battery.log

# 2b. gradient-accumulation sweep: big global batches at the compute-optimal
#     4096 microbatch (accum = batch/4096) vs monolithic
python scripts/bench_sweep.py --batches 8192 --packings 8 --accums 1 2 \
    --epochs_timed 4 2>>perf_battery.md | tee -a perf_battery.log
python scripts/bench_sweep.py --batches 16384 --packings 8 --accums 1 4 \
    --epochs_timed 4 2>>perf_battery.md | tee -a perf_battery.log

# 3. dropout ablation (isolate RNG+mask cost) at 4096
python scripts/bench_sweep.py --batches 4096 --packings 8 --dropout 0.1 0.0 \
    --epochs_timed 4 2>>perf_battery.md | tee -a perf_battery.log

# 4. fused Pallas attention A/B (ONLY after scripts/attn_kernel_check.py has
#    passed on this chip — a faulting kernel takes the whole TPU worker down).
#    Swept across the whole batch curve: the kernel's value claim is removing
#    the HBM logits traffic, which is exactly what makes big batches sublinear.
python scripts/attn_kernel_check.py && \
python scripts/bench_sweep.py --batches 4096 8192 16384 --packings 8 16 \
    --fused 0 1 --epochs_timed 4 2>>perf_battery.md | tee -a perf_battery.log

echo BATTERY DONE
