#!/bin/bash
# Baseline config 3: 10M-point fit at native 1216x368 (BASELINE.md).
# Generates the 10M scene on the TPU (fast raster; also warms the 10M
# sort compile), then runs the short-budget probe fit measuring
# step time + HBM at 10M points.
set -u
cd /root/repo
if [ ! -f data/scene10m/pc.ply ]; then
    echo "[cfg3] generating 10M-point scene on device"
    timeout 2400 python scripts/make_demo_scene.py --out data/scene10m \
        --points 10000000 --views 24 > /tmp/make10m_tpu.log 2>&1 \
        || { echo "[cfg3] scene gen FAILED"; exit 1; }
fi
echo "[cfg3] probe fit"
timeout 3000 python -m read_tpu.train --config configs/scene10m_probe.yaml \
    > /tmp/fit10m.log 2>&1
echo "[cfg3] fit exit $?"
tail -5 /tmp/fit10m.log
