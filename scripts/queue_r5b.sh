#!/bin/bash
# Rebudgeted round-5 TPU queue (replaces queue_r5.sh mid-flight; see
# RESULTS_r05.md "operational note"). Same serialized workload chain,
# budgets cut to fit the remaining round time (~5h): the flagship fit
# gets ~110 min (checkpoints every 5 epochs, best-ckpt kept), the
# A/B + 10M fits run at reduced epoch budgets. Waits for the already-
# running 10M scene generation instead of restarting it.
set -u
cd /root/repo
LOG=/tmp/q5
mkdir -p "$LOG"

step() { echo "[q5b] $(date +%H:%M:%S) $*"; }

step "waiting for in-flight scene10m generation (pid file optional)"
while pgrep -x -f "dummy-never-matches" >/dev/null; do :; done  # no-op
while [ -n "$(ps -p ${MKSCENE_PID:-0} -o pid= 2>/dev/null)" ]; do
    sleep 20
done
step "scene gen done; $(tail -1 $LOG/mkscene10m.log 2>/dev/null)"

step "1/8 flagship quality fit (demo_r5, ~110 min budget)"
timeout 6600 python -u -m read_tpu.train --config configs/demo_drive_r4.yaml \
    --name demo_r5 > "$LOG/fit.log" 2>&1
step "fit exit $?"
EXP=$(ls -dt data/logs/demo_r5_* | head -1)
CKPT1=$EXP/checkpoints/best_demo_drive

step "2/8 full-frame eval of best checkpoint ($CKPT1)"
timeout 1500 python -u -m read_tpu.train --config configs/demo_drive_r4.yaml \
    --resume "$CKPT1" --eval --eval-dir "$LOG/eval" \
    --crop-size 1216x368 --batch-size-val 1 --name eval_r5 \
    > "$LOG/eval.log" 2>&1
step "eval exit $?"

step "3/8 freeze-net texture-only fit of scene 2 (30 epochs)"
timeout 3000 python -u -m read_tpu.train --config configs/demo_drive_r4.yaml \
    --paths-file data/demo_scene2/paths.yaml --name scene2_frozen \
    --net-ckpt "$CKPT1" --freeze-net --epochs 30 \
    > "$LOG/scene2.log" 2>&1
step "scene2 fit exit $?"
EXP2=$(ls -dt data/logs/scene2_frozen_* | head -1)
CKPT2=$EXP2/checkpoints/best_demo_drive

step "4/8 stitch the two independently fitted scenes"
timeout 1500 python -u scripts/stitch_freeze_demo.py \
    --scene1 data/demo_scene/scene.yaml --ckpt1 "$CKPT1" \
    --scene2 data/demo_scene2/scene.yaml --ckpt2 "$CKPT2" \
    --out "$LOG/stitch" > "$LOG/stitch.log" 2>&1
step "stitch exit $?"

step "5/8 baseline configs 1/4/5 runner"
timeout 1500 python -u scripts/run_baseline_configs.py \
    --scene data/demo_scene/scene.yaml --ckpt "$CKPT1" \
    --out "$LOG/baseline_cfgs" > "$LOG/cfgs.log" 2>&1
step "cfgs exit $?"

step "6/8 vgg vs vgg_ens A/B (15 epochs each)"
timeout 1800 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
    --criterion vgg --epochs 15 --name ab_plain > "$LOG/ab_plain.log" 2>&1
step "ab_plain exit $?"
timeout 1800 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
    --criterion vgg_ens --epochs 15 --name ab_ens > "$LOG/ab_ens.log" 2>&1
step "ab_ens exit $?"

step "7/8 baseline config 3: 10M-point native-res fit (12 epochs)"
timeout 2400 python -u -m read_tpu.train --config configs/scene10m_full.yaml \
    --epochs 12 > "$LOG/scene10m.log" 2>&1
step "scene10m fit exit $?"

step "8/8 collect artifacts into the repo tree"
mkdir -p docs/images
cp "$LOG"/stitch/seam_00{0,4,8}.png docs/images/ 2>/dev/null
cp "$LOG"/stitch/stitch_results.json docs/images/ 2>/dev/null
cp "$LOG"/baseline_cfgs/results.json docs/images/baseline_cfgs_r5.json 2>/dev/null
cp "$LOG"/baseline_cfgs/cfg5_panorama.png docs/images/ 2>/dev/null
ls "$LOG"/eval | head -3 | while read f; do
    cp "$LOG/eval/$f" docs/images/ 2>/dev/null; done
step "queue done"
touch /tmp/q5/DONE
