#!/bin/bash
# bf16-blend quality twin runs: the evidence gate for flipping
# RasterConfig.blend_bf16 into the production default (PLAN.md).
# Waits for the r3b sequence to release the TPU, then runs two short
# QVGA e2e twins differing ONLY in the blend mode.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

# Wait for the r3b sequence (if any) to release the TPU.
while ! grep -q "sequence done" /tmp/r3b_sequence.log 2>/dev/null; do
  sleep 60
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
