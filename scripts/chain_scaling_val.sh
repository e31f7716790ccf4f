#!/bin/bash
# Chain: wait for the running scaling experiment (pid in /tmp/scaling.pid),
# then run the select=val follow-up arms on the freed TPU (single-client rule).
set -u
PID=$(cat /tmp/scaling.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
cd /root/repo
exec python scripts/exp_prior_scaling.py \
    --ckpt abruns/k4/checkpoints/Exp_transformer_W64_K4_hybrid_teacher_seed_42_best.ckpt \
    --arms 160,320 --select val --out_dir abruns/prior_scale_val
