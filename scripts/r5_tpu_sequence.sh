#!/bin/bash
# Round-5 TPU sequence A: mapping budget attribution, paired quality twin,
# reduced-budget bisect, bench at the candidate production config.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/4] mapping step budget (production flat path) ==="
timeout 4800 python scripts/profile_map_full.py 2>&1 | grep -v WARNING | tail -10

echo "=== [2/4] QVGA 40f full budget at the r5 production config (track cap 512, B=4) ==="
timeout 4800 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 40 --width 320 --height 240 \
  --track-iters 200 --map-iters 100 --dilate 4 \
  --bucket-floor 131072 \
  --out experiments/r5_qvga_cap512 2>&1 | grep -v WARNING | tail -12

echo "=== [3/4] reduced-budget frame-1 bisect ==="
bash scripts/r5_bisect_frame1.sh

echo "=== [4/4] bench at HEAD config ==="
timeout 3600 python bench.py 2>&1 | grep -v WARNING | tail -6
echo "=== r5 sequence A done ==="
