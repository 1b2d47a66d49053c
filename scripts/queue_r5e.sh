#!/bin/bash
# Round-5 phase-4 queue: takes over after queue_r5d's scene2 step (left
# running). Priorities re-cut after measuring the fit's PSNR slope
# (~0.02 dB/epoch): a third fit-resume slice buys the quality bar back,
# the fps probe + final bench keep VERDICT item 1 honest, and the
# ab/scene10m runs go last under the D2 deadline (dropped if time ran
# out — recorded as such in RESULTS_r05.md).
set -u
cd /root/repo
LOG=/tmp/q5
D1=$(date -d "16:25" +%s)
D2=$(date -d "16:05" +%s)

step() { echo "[q5e] $(date +%H:%M:%S) $*"; }
guard() { [ "$(date +%s)" -le "${2:-$D1}" ] && return 0
          step "deadline passed — skipping $1"; return 1; }

CKPT1=$(ls -dt data/logs/demo_r5b_*/checkpoints/best_demo_drive | head -1)
step "waiting for scene2 fit pid ${S2_PID:?}"
while [ -n "$(ps -p "$S2_PID" -o pid= 2>/dev/null)" ]; do sleep 15; done
step "scene2 done: $(grep -c '^epoch [0-9]*:' $LOG/scene2.log) epochs"
EXP2=$(ls -dt data/logs/scene2_frozen_* 2>/dev/null | head -1)
CKPT2=$EXP2/checkpoints/best_demo_drive

if [ -e "$CKPT2" ] && guard "stitch demo"; then
    step "4 stitch the two independently fitted scenes"
    timeout 1200 python -u scripts/stitch_freeze_demo.py \
        --scene1 data/demo_scene/scene.yaml --ckpt1 "$CKPT1" \
        --scene2 data/demo_scene2/scene.yaml --ckpt2 "$CKPT2" \
        --out "$LOG/stitch" > "$LOG/stitch.log" 2>&1
    step "stitch exit $?"
fi

if guard "baseline configs"; then
    step "5 baseline configs 1/4/5 runner"
    timeout 1200 python -u scripts/run_baseline_configs.py \
        --scene data/demo_scene/scene.yaml --ckpt "$CKPT1" \
        --out "$LOG/baseline_cfgs" > "$LOG/cfgs.log" 2>&1
    step "cfgs exit $?"
fi

if guard "fit resume slice 3"; then
    step "6 resume flagship fit (+40 min, toward the 15.80 dB bar)"
    timeout 2400 python -u -m read_tpu.train \
        --config configs/demo_drive_r4.yaml --name demo_r5c \
        --resume "$CKPT1" > "$LOG/fit3.log" 2>&1
    step "fit slice 3 exit $?"
    EXPC=$(ls -dt data/logs/demo_r5c_* 2>/dev/null | head -1)
    if [ -n "$EXPC" ] && [ -e "$EXPC/checkpoints/best_demo_drive" ]; then
        CKPT1=$EXPC/checkpoints/best_demo_drive
    fi
fi
step "best checkpoint now: $CKPT1"

if guard "frame-gap probe"; then
    step "7 frame-gap probe (fps diagnosis)"
    timeout 1200 python -u scripts/bench_r5_frame_gap.py \
        > "$LOG/frame_gap.log" 2>&1
    step "probe exit $?"
fi

if guard "final bench"; then
    step "8 final bench (frame + train metrics)"
    timeout 1500 python bench.py > "$LOG/bench_final.json" \
        2>"$LOG/bench_final.err"
    step "bench exit $?"
fi

if guard "vgg_ens A/B" "$D2"; then
    step "9 vgg vs vgg_ens A/B (12 epochs each)"
    timeout 1200 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
        --criterion vgg --epochs 12 --name ab_plain \
        > "$LOG/ab_plain.log" 2>&1
    timeout 1200 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
        --criterion vgg_ens --epochs 12 --name ab_ens \
        > "$LOG/ab_ens.log" 2>&1
    step "ab pair exit"
fi

if guard "scene10m fit" "$D2"; then
    step "10 baseline config 3: 10M-point native-res fit (6 epochs)"
    timeout 1200 python -u -m read_tpu.train \
        --config configs/scene10m_full.yaml --epochs 6 \
        > "$LOG/scene10m.log" 2>&1
    step "scene10m fit exit $?"
fi

step "collect artifacts into the repo tree"
mkdir -p docs/images
cp "$LOG"/stitch/seam_00{0,4,8}.png docs/images/ 2>/dev/null
cp "$LOG"/stitch/stitch_results.json docs/images/ 2>/dev/null
cp "$LOG"/baseline_cfgs/results.json docs/images/baseline_cfgs_r5.json 2>/dev/null
cp "$LOG"/baseline_cfgs/cfg5_panorama.png docs/images/ 2>/dev/null
for f in $(ls "$LOG"/eval 2>/dev/null | head -2); do
    cp "$LOG/eval/$f" "docs/images/eval_r5_$f" 2>/dev/null; done
step "queue done"
touch /tmp/q5/DONE
