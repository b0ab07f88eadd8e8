#!/bin/bash
# Round-4 TPU sequence F (post-relay-recovery batch):
# (1) smoke regate, (2) extended rect probe, (3) pass-group ablation at
# the production chunk shape, (4) elem16 e2e quality twin at QVGA full
# budget (the flip gate: compare vs experiments/tum_like_qvga_r4c).
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/4] smoke gate ==="
timeout 3000 python scripts/tpu_smoke.py 2>&1 | grep -E "ok |FAIL|warn|PASS" | tail -30

echo "=== [2/4] extended rect probe ==="
timeout 2400 python scripts/probe_rect_tpu.py 2>&1 | grep -vE "WARNING|^\[2m" | tail -14

echo "=== [3/4] pass-group ablation (K=256 B=2 production shape) ==="
timeout 2400 env ABLATE=full,fwd,noexp,nomxu,min,bf16,elem16 CHUNK=256 B=2 \
  python scripts/profile_fused_ablate.py 2>&1 | grep -v WARNING | tail -10

echo "=== [4/4] QVGA 40f full budget, elem16 (quality twin vs tum_like_qvga_r4c) ==="
timeout 4800 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 40 --width 320 --height 240 \
  --track-iters 200 --map-iters 100 --dilate 4 --elem-bf16 \
  --bucket-floor 131072 \
  --out experiments/r4f_qvga_elem16 2>&1 | grep -v WARNING | tail -6
echo "=== r4f sequence done ==="
