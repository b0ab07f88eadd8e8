#!/bin/bash
# Round-4 TPU sequence B: (1) bisect the 100-iter frame-1 tracking
# regression (preprocess_pallas vs early-stop chunking), (2) tile_capacity
# vs depth-L1 (53% bin truncation measured at QVGA), (3) bf16 flip evidence
# at a healthy budget. Short 15-frame QVGA twins; compile cache is warm for
# the 1024-cap shapes.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

run () {
  name=$1; shift
  echo "=== $name ==="
  timeout 3000 python -m gsorb_slam_tpu.apps.run_benchmark \
    --frames 15 --width 320 --height 240 --dilate 4 \
    --bucket-floor 131072 --out experiments/$name "$@" 2>&1 \
    | grep -v WARNING | tail -8
}

# B-bisect at the failing twin budget (100/50):
run r4b_nopp      --track-iters 100 --map-iters 50 --no-preprocess-pallas
run r4b_es0       --track-iters 100 --map-iters 50 --early-stop-delta 0
# truncation -> depth-L1 at the healthy budget:
run r4b_cap2048   --track-iters 200 --map-iters 100 --tile-capacity 2048
run r4b_ctrl      --track-iters 200 --map-iters 100
# bf16 flip evidence at the healthy budget:
run r4b_bf16full  --track-iters 200 --map-iters 100 --blend-bf16
echo "=== r4b sequence done ==="
