#!/bin/bash
# Serialized post-fit TPU queue for round 4 (one TPU process at a time).
# Waits for the flagship fit, then: full-frame eval, freeze-net scene-2
# texture fit, real two-scene stitch demo, baseline configs, bench.
set -u
cd /root/repo
EXP=$(ls -dt data/logs/demo_r4_* | head -1)
FITPID=$(cat /tmp/fit.pid)

echo "[postfit] waiting for fit pid $FITPID (exp $EXP)"
while kill -0 "$FITPID" 2>/dev/null; do sleep 30; done
echo "[postfit] fit done at $(date)"
sleep 10
CKPT1=$EXP/checkpoints/best_demo_drive

echo "[postfit] 1/5 full-frame eval of best checkpoint"
timeout 2400 python -u -m read_tpu.train --config configs/demo_drive_r4.yaml \
    --resume "$CKPT1" --eval --eval-dir /tmp/eval_r4 \
    --crop-size 1216x368 --batch-size-val 1 --name eval_r4 \
    > /tmp/postfit_eval.log 2>&1
echo "[postfit] eval exit $?"

echo "[postfit] 2/5 freeze-net texture-only fit of scene 2"
timeout 7200 python -u -m read_tpu.train --config configs/demo_drive_r4.yaml \
    --paths-file data/demo_scene2/paths.yaml --name scene2_frozen \
    --net-ckpt "$CKPT1" --freeze-net --epochs 60 \
    > /tmp/postfit_scene2.log 2>&1
echo "[postfit] scene2 fit exit $?"
EXP2=$(ls -dt data/logs/scene2_frozen_* | head -1)
CKPT2=$EXP2/checkpoints/best_demo_drive

echo "[postfit] 3/5 stitch the two independently fitted scenes"
timeout 2400 python -u scripts/stitch_freeze_demo.py \
    --scene1 data/demo_scene/scene.yaml --ckpt1 "$CKPT1" \
    --scene2 data/demo_scene2/scene.yaml --ckpt2 "$CKPT2" \
    --out /tmp/stitch_demo > /tmp/postfit_stitch.log 2>&1
echo "[postfit] stitch exit $?"

echo "[postfit] 4/5 baseline configs 1/4/5"
timeout 2400 python -u scripts/run_baseline_configs.py \
    --scene data/demo_scene/scene.yaml --ckpt "$CKPT1" \
    --out /tmp/baseline_cfgs > /tmp/postfit_cfgs.log 2>&1
echo "[postfit] cfgs exit $?"

echo "[postfit] 5/5 bench"
timeout 900 python bench.py > /tmp/bench_postfit.json 2>/dev/null
echo "[postfit] all done at $(date)"
