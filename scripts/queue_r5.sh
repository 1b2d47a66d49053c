#!/bin/bash
# Round-5 serialized TPU queue (one TPU process at a time; the tunnel
# wedges under concurrent clients — round-5 lesson). Runs every
# outstanding RESULTS_r05 workload in dependency order and leaves logs
# in /tmp/q5. Each step is timeout-bounded so a slow fit cannot starve
# the rest of the queue; fits checkpoint every 5 epochs so the best
# checkpoint survives a timeout.
set -u
cd /root/repo
LOG=/tmp/q5
mkdir -p "$LOG"

step() { echo "[q5] $(date +%H:%M:%S) $*"; }

step "0a/9 clean-window frame bench (the r5 fps number)"
READ_TPU_BENCH_TRAIN=0 timeout 1800 python bench.py \
    > "$LOG/bench_clean.json" 2>"$LOG/bench_clean.err"
step "bench exit $?"

step "0b/9 regenerate 10M-point scene on-TPU"
timeout 3600 python -u scripts/make_demo_scene.py --out data/scene10m \
    --points 10000000 --views 60 > "$LOG/mkscene10m.log" 2>&1
step "mkscene exit $?"

step "1/9 flagship quality fit (demo_r5, 250-epoch budget)"
timeout 13500 python -u -m read_tpu.train --config configs/demo_drive_r4.yaml \
    --name demo_r5 > "$LOG/fit.log" 2>&1
step "fit exit $?"
EXP=$(ls -dt data/logs/demo_r5_* | head -1)
CKPT1=$EXP/checkpoints/best_demo_drive

step "2/9 full-frame eval of best checkpoint ($CKPT1)"
timeout 2400 python -u -m read_tpu.train --config configs/demo_drive_r4.yaml \
    --resume "$CKPT1" --eval --eval-dir "$LOG/eval" \
    --crop-size 1216x368 --batch-size-val 1 --name eval_r5 \
    > "$LOG/eval.log" 2>&1
step "eval exit $?"

step "3/9 freeze-net texture-only fit of scene 2"
timeout 5400 python -u -m read_tpu.train --config configs/demo_drive_r4.yaml \
    --paths-file data/demo_scene2/paths.yaml --name scene2_frozen \
    --net-ckpt "$CKPT1" --freeze-net --epochs 60 \
    > "$LOG/scene2.log" 2>&1
step "scene2 fit exit $?"
EXP2=$(ls -dt data/logs/scene2_frozen_* | head -1)
CKPT2=$EXP2/checkpoints/best_demo_drive

step "4/9 stitch the two independently fitted scenes"
timeout 2400 python -u scripts/stitch_freeze_demo.py \
    --scene1 data/demo_scene/scene.yaml --ckpt1 "$CKPT1" \
    --scene2 data/demo_scene2/scene.yaml --ckpt2 "$CKPT2" \
    --out "$LOG/stitch" > "$LOG/stitch.log" 2>&1
step "stitch exit $?"

step "5/9 baseline configs 1/4/5 runner"
timeout 2400 python -u scripts/run_baseline_configs.py \
    --scene data/demo_scene/scene.yaml --ckpt "$CKPT1" \
    --out "$LOG/baseline_cfgs" > "$LOG/cfgs.log" 2>&1
step "cfgs exit $?"

step "6/9 vgg vs vgg_ens A/B (VERDICT r4 item 7)"
timeout 4500 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
    --criterion vgg --name ab_plain > "$LOG/ab_plain.log" 2>&1
step "ab_plain exit $?"
timeout 4500 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
    --criterion vgg_ens --name ab_ens > "$LOG/ab_ens.log" 2>&1
step "ab_ens exit $?"

step "7/9 baseline config 3: 10M-point native-res fit to budget"
timeout 7200 python -u -m read_tpu.train --config configs/scene10m_full.yaml \
    > "$LOG/scene10m.log" 2>&1
step "scene10m fit exit $?"

step "8/9 final clean bench"
timeout 1800 python bench.py > "$LOG/bench_final.json" 2>"$LOG/bench_final.err"
step "bench exit $?"

step "9/9 queue done"
