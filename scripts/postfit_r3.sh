#!/bin/bash
# Serialized post-fit TPU job queue for round 3 (one TPU process at a
# time — two concurrent TPU processes crash the axon compile helper).
# Waits for the flagship fit to exit, then runs the measurement queue.
set -u
cd /root/repo
EXP=data/logs/demo_r3_0817_113734
FITPID=$(cat /tmp/fit.pid)

echo "[postfit] waiting for fit pid $FITPID"
while kill -0 "$FITPID" 2>/dev/null; do sleep 20; done
echo "[postfit] fit done at $(date)"
sleep 10

echo "[postfit] 1/5 full-frame eval of best checkpoint"
timeout 2400 python -m read_tpu.train --config configs/demo_drive_r3.yaml \
    --resume "$EXP/checkpoints/best_demo_drive" \
    --eval --eval-dir /tmp/eval_r3 --crop-size 1216x368 \
    --batch-size-val 1 --name eval_r3 \
    > /tmp/postfit_eval.log 2>&1
echo "[postfit] eval exit $?"

echo "[postfit] 2/5 baseline configs 1/4/5"
timeout 2400 python scripts/run_baseline_configs.py \
    --scene data/demo_scene/scene.yaml \
    --ckpt "$EXP/checkpoints/best_demo_drive" --out /tmp/baseline_cfgs \
    > /tmp/postfit_cfgs.log 2>&1
echo "[postfit] cfgs exit $?"

echo "[postfit] 3/5 unet backend sweep"
timeout 3600 python scripts/bench_unet_backends.py \
    > /tmp/postfit_unet.log 2>&1
echo "[postfit] unet exit $?"

echo "[postfit] 4/5 raster methods"
timeout 1800 python scripts/bench_raster_methods.py --quick \
    > /tmp/postfit_raster.log 2>&1
echo "[postfit] raster exit $?"

echo "[postfit] 5/5 gather bench"
timeout 1200 python scripts/bench_gather.py > /tmp/postfit_gather.log 2>&1
echo "[postfit] gather exit $?"
echo "[postfit] ALL DONE at $(date)"
