#!/bin/bash
# Post-campaign stage: waits for run_campaign_r2c.sh (PID $1, optional) to
# finish, then runs everything that needs the converged checkpoints and a
# quiet TPU: the second student seed, regenerated derived artifacts, and the
# perf battery (batch sweep + fused-attention A/B feeding BENCH_r02).
# Idempotent: stages skip if their outputs already exist.
set -x
cd /root/repo

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

# 1. Flagship student, seed 1024 (campaign stage 2 only runs seed 42)
if [ ! -f results/log_Exp_transformer_W10_student_seed_1024.json ] && \
   [ -f checkpoints/Exp_transformer_W10_hybrid_teacher_seed_1024_best.ckpt ]; then
  python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
      --data_dir data/dense_w10 --mode student --epochs 300 --batch_size 1024 \
      --patience 20 --seed 1024 --attn_packing 8 \
      --teacher_ckpt checkpoints/Exp_transformer_W10_hybrid_teacher_seed_1024_best.ckpt \
      || echo "STUDENT 1024 FAILED"
fi

# 2. Derived artifacts over the full converged set (incl. both students)
python scripts/plot_results.py
python scripts/export_latex_table.py > results/ablation_table.tex
python scripts/check_parity.py || true
python scripts/summarize_ab.py > docs/AB_ARMS.md || true

# 3. Perf battery (quiet chip): batch/packing/dtype/accum sweep + fused A/B
bash scripts/run_perf_battery.sh

echo "AFTER CAMPAIGN DONE"
