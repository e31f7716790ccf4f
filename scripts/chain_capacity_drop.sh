#!/bin/bash
# Chain: wait for the d384L6 capacity arm (pid in /tmp/capacity.pid), then run
# the regularization arm (baseline size, dropout 0.3) on the freed TPU
# (single-client rule).
set -u
PID=$(cat /tmp/capacity.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
cd /root/repo
exec timeout 5400 python scripts/exp_prior_scaling.py \
    --ckpt abruns/k4/checkpoints/Exp_transformer_W64_K4_hybrid_teacher_seed_42_best.ckpt \
    --arms 640 --select val --tag _drop03 --prior_dropout 0.3 \
    --out_dir abruns/prior_scale_val
