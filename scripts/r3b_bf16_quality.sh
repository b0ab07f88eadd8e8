#!/bin/bash
# bf16-blend quality twin runs: the evidence gate for flipping
# RasterConfig.blend_bf16 into the production default (PLAN.md).
# Waits for the r3b sequence to release the TPU, then runs two short
# QVGA e2e twins differing ONLY in the blend mode.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

# Wait for the r3b sequence (if any) to release the TPU. The sequence
# script does not write this log itself — it only exists when the caller
# redirected stdout there — so skip the wait when the file is absent and
# bound it either way (the sequence never legitimately runs >3h).
waited=0
while [ -f /tmp/r3b_sequence.log ] \
    && ! grep -q "sequence done" /tmp/r3b_sequence.log 2>/dev/null; do
  sleep 60
  waited=$((waited + 60))
  if [ "$waited" -ge 10800 ]; then
    echo "WARN: r3b sequence log never completed after 3h; proceeding" >&2
    break
  fi
done

for mode in f32 bf16; do
  extra=""
  if [ "$mode" = "bf16" ]; then extra="--blend-bf16"; fi
  timeout 2400 python -m gsorb_slam_tpu.apps.run_benchmark \
    --frames 15 --width 320 --height 240 \
    --track-iters 100 --map-iters 50 \
    --dilate 4 $extra \
    --bucket-floor 131072 \
    --out experiments/qvga_blend_${mode} 2>&1 | tail -4
done
echo "=== bf16 quality twins done ==="
