#!/bin/bash
# Round-4 TPU sequence G (resume of the interrupted sequence F):
# (1) elem16 e2e quality twin at QVGA full budget (the flip gate; F died at
#     frame 30/40 when the session ended), (2) pass-group ablation at the
#     production chunk shape (F crashed: gt tiles are 8 rows now),
# (3) bench with elem16 forced on — the measured it/s if the gate passes.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/3] QVGA 40f full budget, elem16 (quality twin vs tum_like_qvga_r4c) ==="
timeout 4800 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 40 --width 320 --height 240 \
  --track-iters 200 --map-iters 100 --dilate 4 --elem-bf16 \
  --bucket-floor 131072 \
  --out experiments/r4g_qvga_elem16 2>&1 | grep -v WARNING | tail -8

echo "=== [2/3] pass-group ablation (K=256 B=2 production shape) ==="
timeout 2400 env ABLATE=full,fwd,noexp,nomxu,min,bf16,elem16 CHUNK=256 B=2 \
  python scripts/profile_fused_ablate.py 2>&1 | grep -v WARNING | tail -10

echo "=== [3/3] bench, elem16 forced on ==="
timeout 3600 env GSORB_BENCH_ELEM16=1 python bench.py 2>&1 | grep -v WARNING | tail -8
echo "=== r4g sequence done ==="
