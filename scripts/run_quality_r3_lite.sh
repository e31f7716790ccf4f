#!/bin/bash
# Round-3 quality stage, time-boxed variant of run_quality_r3.sh.
#
# Regenerates ONLY the results/ rows that the round-3 criteria/fixes need,
# ordered by marginal value so a wall-clock cutoff mid-script still leaves
# every finished run usable:
#
#   1. resnet+lfq W64      (C9.1/C9.2 — collapse fix, LFQ_FLAGS from the sweep)
#   2. resnet+fsq W64      (C2 — latent-spread fix, FSQ_FLAGS from the arms)
#   3. resnet+hybrid W64   (C2 hybrid ratio + C1/C3 inputs)
#   4. resnet+rvq / +ema / simple+ema W64  (keep C1's ordering single-regime)
#   5. transformer+hybrid W64 teacher      (C10 vs BASELINE row 5)
#   6. W64 students for retrained teachers (latex Cross/Align columns)
#   7. derived artifacts (plots, latex, parity)
#
# Flags come from the decided defaults (docs/REF_EXACT.md) — pass overrides:
#   FLAGS="" LFQ_FLAGS="--lfq_norm" FSQ_FLAGS="--fsq_bounded" \
#       bash scripts/run_quality_r3_lite.sh
# The flagship W10 rows (C5-C8) are NOT regenerated here: they pass under the
# round-2 regime and their configs are embedded in the logs; full regen is
# run_quality_r3.sh (round-4 work if this round's clock runs out first).
set -x
cd /root/repo

FLAGS=${FLAGS:-}
LFQ_FLAGS=${LFQ_FLAGS:-$FLAGS}
FSQ_FLAGS=${FSQ_FLAGS:-$FLAGS}
GRID_EPOCHS=${GRID_EPOCHS:-300}

grid_teacher () {  # arch method extra-flags...
  arch=$1; method=$2; shift 2
  python scripts/train_ablation.py --arch $arch --method $method --window 64 \
      --data_dir data/dense_w64 --epochs $GRID_EPOCHS --batch_size 512 \
      --patience 20 --seed 42 1024 --multiseed --save_every 50 "$@" \
      || echo "GRID ${arch}_${method} FAILED"
}

grid_teacher resnet lfq $LFQ_FLAGS
grid_teacher resnet fsq $FSQ_FLAGS
grid_teacher resnet hybrid $FSQ_FLAGS
grid_teacher resnet rvq $FLAGS
grid_teacher resnet ema $FLAGS
grid_teacher simple ema $FLAGS

# C10: W64-era transformer teacher (bf16+rbg production regime; quality-
# neutral vs f32 at equal epochs, docs/REF_EXACT.md)
python scripts/train_ablation.py --arch transformer --method hybrid --window 64 \
    --data_dir data/dense_w64 --epochs 300 --batch_size 512 --patience 30 \
    --seed 42 1024 --multiseed --attn_packing 2 --bf16 --prng rbg \
    --save_every 50 $FLAGS || echo "W64 TRANSFORMER FAILED"

# students for the retrained teachers (Cross/Align latex columns)
grid_student () {  # arch method extra-flags...
  arch=$1; method=$2; shift 2
  python scripts/train_ablation.py --arch $arch --method $method --window 64 \
      --data_dir data/dense_w64 --mode student --epochs 120 --batch_size 1024 \
      --patience 20 --seed 42 1024 --multiseed --save_every 50 \
      --teacher_ckpt "checkpoints/Exp_${arch}_W64_${method}_teacher_seed_{seed}_best.ckpt" \
      "$@" || echo "STUDENT ${arch}_${method} FAILED"
}

grid_student resnet lfq $LFQ_FLAGS
grid_student resnet fsq $FSQ_FLAGS
grid_student resnet hybrid $FSQ_FLAGS
grid_student resnet rvq $FLAGS
grid_student resnet ema $FLAGS
grid_student simple ema $FLAGS

python scripts/plot_results.py || echo "PLOTS FAILED"
python scripts/export_latex_table.py > results/ablation_table.tex || echo "LATEX FAILED"
python scripts/check_parity.py || echo "PARITY FAILED"

echo "QUALITY R3 LITE DONE"
