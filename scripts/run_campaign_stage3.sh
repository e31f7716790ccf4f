#!/bin/bash
# Stage 3: regenerate the seed-42 flagship teacher log (its id-log was
# clobbered by the concurrently-running student before the mode-distinct
# log-name fix), then rebuild every derived artifact from the converged runs.
set -x
cd /root/repo

# the student's history lives in its mode-log; drop its copy of the teacher's
# id-log name before the teacher rerun reclaims it
if [ -f results/log_Exp_transformer_W10_student_seed_42.json ]; then
  rm -f results/log_transformer_hybrid_seed_42.json
fi

# flagship teacher seed 42, sequential trainer (fresh full history + ckpts)
python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --data_dir data/dense_w10 --epochs 340 --batch_size 512 --patience 20 \
    --seed 42 --attn_packing 8 \
    || echo "TEACHER42 RERUN FAILED"

# derived artifacts
python scripts/plot_results.py
python scripts/export_latex_table.py > results/ablation_table.tex
python scripts/check_parity.py || true
python scripts/export_motion.py \
    --ckpt checkpoints/Exp_transformer_W10_hybrid_teacher_seed_42_best.ckpt \
    --num_samples 3 --data_dir data/dense_w10
python scripts/play_g1_npy.py \
    --input_file motions/recon_transformer_FullSeq_W10_idx0.npy \
    --render plots/replay_flagship.gif
python scripts/analyze_latent_space.py --raw_dir data/raw_actions \
    --data_dir data/dense_w10 \
    --ckpt checkpoints/Exp_transformer_W10_hybrid_teacher_seed_42_best.ckpt || true
python scripts/analyze_latent_space.py --raw_dir data/raw_actions \
    --data_dir data/dense_w10 \
    --ckpt checkpoints/Exp_transformer_W10_hybrid_student_seed_42_best.ckpt || true

echo "STAGE3 DONE"
