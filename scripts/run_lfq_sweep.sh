#!/bin/bash
# LFQ collapse sweep (round-2 VERDICT item 3).
#
# diag_lfq.py measured the failure: STE recon gradients inflate the pre-sign
# scale to O(1000) in ~8 epochs, the entropy term saturates to 0, sign flips
# stop, and train recon freezes at the data variance (results/
# log_resnet_lfq_seed_42.json stopped at epoch 26 on patience). Arms isolate
# the candidate cures at 80 epochs, seed 42, resnet W64 (the grid config).
#
# All arms sit on the round-3 A/B-chosen defaults (torch_init +
# ref_exact_vel, docs/REF_EXACT.md) — the regime the results/ LFQ row will be
# retrained under:
#
#   base        — new defaults only (torch init starts 2.4x smaller than the
#                 collapsed round-2 lecun run; does that alone cure it?)
#   norm        — pre-sign LayerNorm (lfq_norm flag)
#   ent0        — entropy weight 0 (isolate the regularizer's role)
#   ent5        — entropy weight 0.5 (stronger anti-saturation force)
#   norm_ent0   — LayerNorm without the entropy force
#   lecun       — --no-torch_init control (the round-2 regime; expected to
#                 reproduce the collapse)
#
# Summarize with scripts/summarize_lfq_sweep.py; winner gets the 300-epoch
# 2-seed run for results/ (run_quality_r3_lite.sh LFQ_FLAGS).
set -x
cd /root/repo

EPOCHS=${EPOCHS:-80}
run () {
  arm=$1; shift
  mkdir -p abruns/lfq/$arm
  python /root/repo/scripts/train_ablation.py --arch resnet --method lfq \
      --window 64 --data_dir /root/repo/data/dense_w64 --epochs $EPOCHS \
      --batch_size 512 --seed 42 \
      --log_dir abruns/lfq/$arm/results --checkpoint_dir abruns/lfq/$arm/checkpoints \
      "$@" || echo "LFQ ARM $arm FAILED"
}

run base
run norm --lfq_norm
run ent0 --entropy_weight 0.0
run ent5 --entropy_weight 0.5
run norm_ent0 --lfq_norm --entropy_weight 0.0
run lecun --no-torch_init

echo "LFQ SWEEP DONE"
