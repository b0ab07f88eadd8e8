#!/bin/bash
# Round-4 TPU sequence C: confirm the new production defaults
# (tile_capacity 2048 + blend_bf16) at full reference budgets, re-bench,
# and time the rectangular-tile kernels.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/4] bench.py at the new production defaults (cap2048 + bf16) ==="
timeout 2400 python bench.py 2>&1 | grep -v WARNING | tail -3

echo "=== [2/4] QVGA 40f full budget, new defaults ==="
timeout 4800 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 40 --width 320 --height 240 \
  --track-iters 200 --map-iters 100 --dilate 4 \
  --bucket-floor 131072 \
  --out experiments/tum_like_qvga_r4b 2>&1 | grep -v WARNING | tail -6

echo "=== [3/4] VGA 60f full budget, new defaults (VERDICT item-4 gate) ==="
timeout 9000 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 60 --track-iters 200 --map-iters 100 \
  --rebin-iters 8 40 120 \
  --bucket-floor 524288 \
  --out experiments/tum_like_vga_r4 2>&1 | grep -v WARNING | tail -6

echo "=== [4/4] fused-kernel sweep incl. rectangular 16x8 tiles ==="
timeout 3600 env RECT=1 python scripts/profile_fused.py 2>&1 | grep -v WARNING | tail -16
echo "=== r4c sequence done ==="
