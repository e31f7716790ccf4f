#!/bin/bash
# Round-3 stage-2 TPU queue: runs AFTER the stage-1 A/B + sweeps decided the
# default semantics (flipped in config.py, so FLAGS is normally empty).
#
#   1. quality campaign      — regenerate results/ under the chosen defaults
#                              (flagship, students, anchor, W64 grid + students,
#                              W64 transformer, plots/latex/parity)
#   2. perf benches          — cheap-dropout sweep, multiseed vmap bench,
#                              final bench.py line
set -x
cd /root/repo

bash scripts/run_quality_r3.sh

python scripts/bench_sweep.py --batches 16384 --packings 8 --accums 32 \
    --cheap 0 1 2>> perf_battery.md || echo "SWEEP CHEAP FAILED"
python scripts/bench_sweep.py --batches 16384 --packings 8 --accums 16 64 \
    --cheap 1 2>> perf_battery.md || echo "SWEEP CHEAP MICRO FAILED"
python scripts/bench_sweep.py --batches 8192 --packings 8 --accums 16 \
    --cheap 1 2>> perf_battery.md || echo "SWEEP CHEAP 8K FAILED"
python scripts/bench_multiseed.py 2>> perf_battery.md \
    || echo "BENCH MULTISEED FAILED"
python bench.py || echo "BENCH FAILED"

echo "R3 STAGE2 DONE"
