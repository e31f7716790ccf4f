#!/bin/bash
# Stage-2 (student) runs for every ablation-grid experiment, per seed from its
# matching teacher-best checkpoint, so the table's Cross/Align columns are
# sourced from trained human encoders (eval/latex.py STUDENT_SOURCED).
# Waits for a prior job (PID $1) to release the chip. Idempotent.
set -x
cd /root/repo

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

for am in "simple ema" "resnet ema" "resnet rvq" "resnet fsq" "resnet lfq" "resnet hybrid"; do
  set -- $am
  for s in 42 1024; do
    [ -f results/log_${1}_${2}_student_seed_${s}.json ] && continue
    python scripts/train_ablation.py --arch $1 --method $2 --window 64 \
        --data_dir data/dense_w64 --mode student --epochs 120 --batch_size 1024 \
        --patience 20 --seed $s \
        --teacher_ckpt checkpoints/Exp_${1}_W64_${2}_teacher_seed_${s}_best.ckpt \
        || echo "GRID STUDENT ${1}_${2} seed $s FAILED"
  done
done

python scripts/plot_results.py
python scripts/export_latex_table.py > results/ablation_table.tex
python scripts/check_parity.py || true

echo "GRID STUDENTS DONE"
