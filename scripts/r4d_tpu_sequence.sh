#!/bin/bash
# Round-4 TPU sequence D: gate + confirm the consolidated production
# config — chunk 256 (B=2/U=2), split tracking capacity (1024 vs 2048),
# blend_bf16, densify guards (sat-tile suppression + 16k/frame budget).
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/4] smoke gate (incl. chunk-256 production shape + rect16x8) ==="
timeout 3000 python scripts/tpu_smoke.py 2>&1 | grep -E "ok |FAIL"

echo "=== [2/4] bench.py (chunk 256 + split capacity + bf16) ==="
timeout 2400 python bench.py 2>&1 | grep -v WARNING | tail -3

echo "=== [3/4] QVGA 40f full budget (confirm split-capacity quality) ==="
timeout 4800 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 40 --width 320 --height 240 \
  --track-iters 200 --map-iters 100 --dilate 4 \
  --bucket-floor 131072 \
  --out experiments/tum_like_qvga_r4c 2>&1 | grep -v WARNING | tail -6

echo "=== [4/4] VGA 60f full budget (item-4 gate w/ densify guards) ==="
timeout 9000 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 60 --track-iters 200 --map-iters 100 \
  --rebin-iters 8 40 120 \
  --bucket-floor 524288 \
  --out experiments/tum_like_vga_r4b 2>&1 | grep -v WARNING | tail -6
echo "=== r4d sequence done ==="
