#!/bin/bash
# Round-5 phase-5 queue: the items the D2 deadline dropped, run in the
# post-DONE chip window in value order — fit slice 4 (to push past the
# 15.80 dB bar), the vgg_ens A/B, then the 10M-point fit (last: its
# compile is the biggest and an interrupted compile wedges the chip).
set -u
cd /root/repo
LOG=/tmp/q5

step() { echo "[q5f] $(date +%H:%M:%S) $*"; }

CKPT=$(ls -dt data/logs/demo_r5c_*/checkpoints/best_demo_drive | head -1)
step "1 fit slice 4 from $CKPT (+40 min)"
timeout 2400 python -u -m read_tpu.train \
    --config configs/demo_drive_r4.yaml --name demo_r5d \
    --resume "$CKPT" > "$LOG/fit4.log" 2>&1
step "fit slice 4 exit $?"

step "2 vgg vs vgg_ens A/B (12 epochs each)"
timeout 1300 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
    --criterion vgg --epochs 12 --name ab_plain \
    > "$LOG/ab_plain.log" 2>&1
step "ab_plain exit $?"
timeout 1600 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
    --criterion vgg_ens --epochs 12 --name ab_ens \
    > "$LOG/ab_ens.log" 2>&1
step "ab_ens exit $?"

step "3 baseline config 3: 10M-point native-res fit (6 epochs)"
timeout 1800 python -u -m read_tpu.train \
    --config configs/scene10m_full.yaml --epochs 6 \
    > "$LOG/scene10m.log" 2>&1
step "scene10m fit exit $?"

step "phase-5 done"
touch /tmp/q5/DONE5
