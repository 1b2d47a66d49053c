#!/bin/bash
# Round-5 phase-3 queue (replaces queue_r5c.sh, whose fit-resume step
# picked an interrupted ``ckpt_*.tmp`` write and exited). Waits for the
# in-flight full-frame eval, resumes the flagship fit from the last
# COMPLETE rotating checkpoint, then runs the remaining workloads in
# VERDICT priority order under two wall-clock deadlines (D2 for the
# long tail steps) so nothing contends with the driver's end-of-round
# bench on the single-client chip.
set -u
cd /root/repo
LOG=/tmp/q5
mkdir -p "$LOG"
D1=$(date -d "16:25" +%s)   # no step may START after this
D2=$(date -d "16:02" +%s)   # ab/scene10m must start before this

step() { echo "[q5d] $(date +%H:%M:%S) $*"; }
guard() { [ "$(date +%s)" -le "${2:-$D1}" ] && return 0
          step "deadline passed — skipping $1"; return 1; }

step "waiting for in-flight eval pid ${EVAL_PID:?}"
while [ -n "$(ps -p "$EVAL_PID" -o pid= 2>/dev/null)" ]; do sleep 15; done
step "eval(ep50 ckpt) done: $(grep 'VAL LOSS' $LOG/eval.log | tail -1)"

EXP=$(ls -dt data/logs/demo_r5_0* | head -1)
if guard "fit resume slice"; then
    LATEST=$(ls -dt "$EXP"/checkpoints/ckpt_demo_drive_* \
             | grep -v '\.tmp$' | head -1)
    step "1b resume fit from $LATEST (+30 min)"
    timeout 1800 python -u -m read_tpu.train \
        --config configs/demo_drive_r4.yaml --name demo_r5b \
        --resume "$LATEST" > "$LOG/fit2.log" 2>&1
    step "fit slice 2 exit $?"
    EXPB=$(ls -dt data/logs/demo_r5b_* 2>/dev/null | head -1)
    if [ -n "$EXPB" ] && [ -e "$EXPB/checkpoints/best_demo_drive" ]; then
        EXP=$EXPB
    fi
fi
CKPT1=$EXP/checkpoints/best_demo_drive
step "best checkpoint: $CKPT1"

if guard "scene2 freeze-net fit"; then
    step "3 freeze-net texture-only fit of scene 2 (25 epochs)"
    timeout 1800 python -u -m read_tpu.train \
        --config configs/demo_drive_r4.yaml \
        --paths-file data/demo_scene2/paths.yaml --name scene2_frozen \
        --net-ckpt "$CKPT1" --freeze-net --epochs 25 \
        > "$LOG/scene2.log" 2>&1
    step "scene2 fit exit $?"
fi
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

if guard "frame-gap probe"; then
    step "6 frame-gap probe (fps diagnosis)"
    timeout 1200 python -u scripts/bench_r5_frame_gap.py \
        > "$LOG/frame_gap.log" 2>&1
    step "probe exit $?"
fi

if guard "final bench"; then
    step "7 final bench (frame + train metrics)"
    timeout 1500 python bench.py > "$LOG/bench_final.json" \
        2>"$LOG/bench_final.err"
    step "bench exit $?"
fi

if guard "vgg_ens A/B" "$D2"; then
    step "8 vgg vs vgg_ens A/B (12 epochs each)"
    timeout 1200 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
        --criterion vgg --epochs 12 --name ab_plain \
        > "$LOG/ab_plain.log" 2>&1
    step "ab_plain exit $?"
    timeout 1200 python -u -m read_tpu.train --config configs/ab_vgg.yaml \
        --criterion vgg_ens --epochs 12 --name ab_ens \
        > "$LOG/ab_ens.log" 2>&1
    step "ab_ens exit $?"
fi

if guard "scene10m fit" "$D2"; then
    step "9 baseline config 3: 10M-point native-res fit (8 epochs)"
    timeout 1500 python -u -m read_tpu.train \
        --config configs/scene10m_full.yaml --epochs 8 \
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
