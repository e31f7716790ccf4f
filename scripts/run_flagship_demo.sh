#!/usr/bin/env bash
# Flagship two-stage demo (reference README workflow, W10):
# teacher (transformer+hybrid) -> student (align human encoder) -> export ->
# replay render. Usage: scripts/run_flagship_demo.sh [EPOCHS] [DATA_DIR]
set -u
cd "$(dirname "$0")/.."

EPOCHS=${1:-80}
DATA=${2:-data/processed_w10}

if [ ! -f "$DATA/g1_train.npy" ]; then
  python scripts/process_data.py --synthetic --window 10 --step 2 \
      --n_sequences 64 --output_dir "$DATA"
fi

python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --epochs "$EPOCHS" --batch_size 512 --seed 42 --patience 30 --data_dir "$DATA"

TEACHER=checkpoints/Exp_transformer_W10_hybrid_teacher_seed_42_best.ckpt
python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --mode student --epochs "$EPOCHS" --batch_size 512 --seed 42 --patience 30 \
    --data_dir "$DATA" --teacher_ckpt "$TEACHER"

python scripts/export_motion.py --ckpt "$TEACHER" --data_dir "$DATA" \
    --num_samples 2 --output_dir motions
python scripts/play_g1_npy.py \
    --input_file motions/recon_transformer_FullSeq_W10_idx0.npy \
    --render plots/replay_flagship.gif
echo "=== flagship demo complete ==="
