#!/bin/bash
# Round-3 quality campaign: regenerate results/ under the chosen defaults.
#
# Run AFTER the factorized A/B decides the default init/EMA/vel semantics
# (docs/REF_EXACT.md) and the LFQ sweep picks the LFQ configuration. Pass the
# winning flags via FLAGS (applied to every run) and LFQ_FLAGS (extra flags
# for the LFQ grid entry), e.g.:
#
#   FLAGS="--torch_init" LFQ_FLAGS="--lfq_norm --torch_init" \
#       bash scripts/run_quality_r3.sh
#
# All runs use the pinned datasets (scripts/gen_datasets.py) and write to
# results/ + checkpoints/ (the parity/latex/plot consumers' tree).
set -x
cd /root/repo

FLAGS=${FLAGS:-}
LFQ_FLAGS=${LFQ_FLAGS:-$FLAGS}
GRID_EPOCHS=${GRID_EPOCHS:-300}
FLAG_EPOCHS=${FLAG_EPOCHS:-400}

# 1. flagship transformer+hybrid W10 teacher, 2 seeds (bf16 production regime)
python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --data_dir data/dense_w10 --epochs $FLAG_EPOCHS --batch_size 512 --patience 25 \
    --seed 42 1024 --multiseed --attn_packing 8 --bf16 --prng rbg --save_every 25 \
    $FLAGS || echo "FLAGSHIP TEACHER FAILED"

# 2. flagship students, per-seed teacher pairing via {seed} placeholder
python scripts/train_ablation.py --arch transformer --method hybrid --window 10 \
    --data_dir data/dense_w10 --mode student --epochs 200 --batch_size 1024 \
    --patience 25 --seed 42 1024 --multiseed --attn_packing 8 --bf16 --prng rbg \
    --save_every 25 \
    --teacher_ckpt "checkpoints/Exp_transformer_W10_hybrid_teacher_seed_{seed}_best.ckpt" \
    $FLAGS || echo "FLAGSHIP STUDENT FAILED"

# 3. resnet_no_down + ae anchor (C6.1)
python scripts/train_ablation.py --arch resnet_no_down --method ae --window 10 \
    --data_dir data/dense_w10 --epochs 430 --batch_size 4096 --patience 20 \
    --seed 42 1024 --multiseed --save_every 25 $FLAGS \
    || echo "ANCHOR FAILED"

# 4. W64 ablation grid, teachers (C1/C2/C3/C9)
for am in "simple ema" "resnet ema" "resnet rvq" "resnet fsq" "resnet hybrid"; do
  set -- $am
  python scripts/train_ablation.py --arch $1 --method $2 --window 64 \
      --data_dir data/dense_w64 --epochs $GRID_EPOCHS --batch_size 512 --patience 20 \
      --seed 42 1024 --multiseed --save_every 25 $FLAGS \
      || echo "GRID $1_$2 FAILED"
done
python scripts/train_ablation.py --arch resnet --method lfq --window 64 \
    --data_dir data/dense_w64 --epochs $GRID_EPOCHS --batch_size 512 --patience 20 \
    --seed 42 1024 --multiseed --save_every 25 $LFQ_FLAGS \
    || echo "GRID resnet_lfq FAILED"

# 5. grid students (Cross/Align columns), per-seed teachers
for am in "simple ema" "resnet ema" "resnet rvq" "resnet fsq" "resnet hybrid"; do
  set -- $am
  python scripts/train_ablation.py --arch $1 --method $2 --window 64 \
      --data_dir data/dense_w64 --mode student --epochs 120 --batch_size 1024 \
      --patience 20 --seed 42 1024 --multiseed --save_every 25 \
      --teacher_ckpt "checkpoints/Exp_${1}_W64_${2}_teacher_seed_{seed}_best.ckpt" \
      $FLAGS || echo "STUDENT $1_$2 FAILED"
done
python scripts/train_ablation.py --arch resnet --method lfq --window 64 \
    --data_dir data/dense_w64 --mode student --epochs 120 --batch_size 1024 \
    --patience 20 --seed 42 1024 --multiseed --save_every 25 \
    --teacher_ckpt "checkpoints/Exp_resnet_W64_lfq_teacher_seed_{seed}_best.ckpt" \
    $LFQ_FLAGS || echo "STUDENT resnet_lfq FAILED"

# 6. W64-era transformer+hybrid teacher (parity row C10 vs BASELINE row 5;
#    bf16+rbg production regime — measured quality-neutral, docs/REF_EXACT.md)
python scripts/train_ablation.py --arch transformer --method hybrid --window 64 \
    --data_dir data/dense_w64 --epochs 300 --batch_size 512 --patience 30 \
    --seed 42 1024 --multiseed --attn_packing 2 --bf16 --prng rbg \
    --save_every 25 $FLAGS || echo "W64 TRANSFORMER FAILED"

# 7. derived artifacts
python scripts/plot_results.py || echo "PLOTS FAILED"
python scripts/export_latex_table.py > results/ablation_table.tex || echo "LATEX FAILED"
python scripts/check_parity.py || echo "PARITY FAILED"

echo "QUALITY R3 DONE"
