#!/bin/bash
# Round-3 continuation TPU sequence: the e2e reruns the first r3 session
# never reached (relay wedge), most-valuable-first.
# Run UNBOUNDED — killing a client mid-remote-compile wedges the axon relay.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/4] VGA e2e, full reference budget (200/100, dilate 4, rebin 8/40/120) ==="
timeout 5400 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 60 --track-iters 200 --map-iters 100 \
  --dilate 4 --rebin-iters 8 40 120 \
  --bucket-floor 524288 \
  --out experiments/tum_like_vga_r3 2>&1

echo "=== [2/4] QVGA e2e at the reference budget (200/100) ==="
timeout 3600 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 40 --width 320 --height 240 \
  --track-iters 200 --map-iters 100 \
  --dilate 4 \
  --bucket-floor 131072 \
  --out experiments/tum_like_qvga_r3 2>&1

echo "=== [3/4] QVGA with loop closing live ==="
timeout 3600 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 60 --width 320 --height 240 \
  --track-iters 100 --map-iters 60 \
  --dilate 4 --loop \
  --bucket-floor 131072 \
  --out experiments/tum_like_qvga_loop 2>&1

echo "=== [4/4] fused-kernel ablation timing (elem16 vs bf16 vs f32) ==="
timeout 2400 env ABLATE=full,bf16,elem16,fwd python scripts/profile_fused_ablate.py 2>&1 | tail -10
echo "=== sequence done ==="
