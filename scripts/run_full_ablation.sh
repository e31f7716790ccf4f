#!/usr/bin/env bash
# Run the full EXPERIMENTS registry grid (reference README workflow) on the
# processed dataset, then regenerate plots + LaTeX. Usage:
#   scripts/run_full_ablation.sh [EPOCHS] [BATCH] [WINDOW] ["SEEDS"]
set -u
cd "$(dirname "$0")/.."

EPOCHS=${1:-400}
BATCH=${2:-512}
WINDOW=${3:-64}
SEEDS=${4:-"42 1024"}

run() {
  local arch=$1 method=$2
  echo "=== ${arch} + ${method} ==="
  python scripts/train_ablation.py --arch "$arch" --method "$method" \
    --window "$WINDOW" --epochs "$EPOCHS" --batch_size "$BATCH" \
    --seed $SEEDS --patience 20 || echo "FAILED: ${arch}+${method}"
}

# the reference's ablation registry (models/experiment_config.py:9-18)
run simple ema
run resnet ema
run resnet rvq
run resnet fsq
run resnet lfq
run resnet hybrid

python scripts/plot_results.py
python scripts/export_latex_table.py | tee results/ablation_table.tex
echo "=== ablation complete ==="
