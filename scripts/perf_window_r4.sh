#!/bin/bash
# Round-4 on-chip perf window: run while the flagship fit is PAUSED.
# Each probe is its own process (a worker fault kills one probe, not
# the window); risky bf16_mxu probes run LAST so a fault cannot eat
# the safe measurements. Logs land in /tmp/w4/.
set -u
cd /root/repo
mkdir -p /tmp/w4
run() {
  local name=$1; shift
  echo "[window] $name: $*"
  timeout 900 env "$@" python scripts/bench_r4_probe.py ${PROBE} \
      > /tmp/w4/$name.log 2>&1
  echo "[window] $name exit $?"
  tail -4 /tmp/w4/$name.log | grep -v Platform || true
}

PROBE="unet 1"
run unet_pack9 X=1
PROBE="unet 1"
run unet_dot3 READ_TPU_CONV3_IMPL=dot3

PROBE="frame 1"
run frame1_dot3 READ_TPU_CONV3_IMPL=dot3
PROBE="frame 8"
run frame8_dot3 READ_TPU_CONV3_IMPL=dot3

PROBE="pzb2"
run pzb2_fine X=1

# ---- risky tail: bf16 MXU operands (in-register casts; designed to
# dodge the r3 bf16-VMEM-ref fault, but unproven on this worker) ----
PROBE="unet 1"
run unet_pack9_bf16mxu READ_TPU_UNET_DTYPE=bf16_mxu
PROBE="unet 1"
run unet_dot3_bf16mxu READ_TPU_CONV3_IMPL=dot3 READ_TPU_UNET_DTYPE=bf16_mxu

echo "[window] done at $(date)"
