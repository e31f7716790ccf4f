#!/bin/bash
# Factorized ref-exact A/B (round-2 VERDICT item 1).
#
# The round-2 A/B flipped all three documented deviations at once and the
# ref_exact arm won by ~35% on best val_recon — confounded. This campaign
# runs each deviation as its own single-flag arm so the delta decomposes:
#
#   default    — repo defaults (time-axis vel, warm EMA, lecun-normal init)
#   torch_init — ONLY torch kaiming/xavier-uniform kernel inits
#   cold_ema   — ONLY the reference's cold EMA-state init
#   ref_vel    — ONLY the channel-axis velocity diff
#   ref_exact  — all three (reproduces the round-2 confounded arm)
#
# Flagship transformer+hybrid teacher, W10 pinned dense set, batch 1024,
# 150 epochs x seeds {42,1024} via the multiseed vmap, on the production
# bf16+rbg regime (round-2 evidence: bf16 matches f32 quality at equal
# epochs, docs/REF_EXACT.md; the f32 multiseed arm measured 33s/epoch on the
# tunneled chip — 5 arms would not fit a round). All five arms share the
# regime, so per-flag deltas stay internally comparable. Summarize with
# scripts/summarize_ab_factorized.py.
set -x
cd /root/repo

EPOCHS=${EPOCHS:-150}
for arm in default torch_init cold_ema ref_vel ref_exact; do
  case $arm in
    default)    EXTRA="";;
    torch_init) EXTRA="--torch_init";;
    cold_ema)   EXTRA="--cold_ema";;
    ref_vel)    EXTRA="--ref_exact_vel";;
    ref_exact)  EXTRA="--ref_exact";;
  esac
  mkdir -p abruns/ab3/$arm
  python /root/repo/scripts/train_ablation.py --arch transformer --method hybrid \
      --window 10 --data_dir /root/repo/data/dense_w10 --epochs $EPOCHS \
      --batch_size 1024 --seed 42 1024 --multiseed --attn_packing 8 \
      --bf16 --prng rbg --save_every 25 \
      --log_dir abruns/ab3/$arm/results --checkpoint_dir abruns/ab3/$arm/checkpoints \
      $EXTRA \
      || echo "AB ARM $arm FAILED"
done

echo "AB FACTORIZED DONE"
