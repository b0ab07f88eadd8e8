#!/bin/bash
# Round-4 TPU sequence E: perf deep-dive after the r4d confirm —
# (1) in-situ elem16 / K-256 combos, (2) pass-group ablation at the
# production chunk shape, (3) mapping iteration breakdown.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/3] fused sweep (elem16 in situ, K=256 combos) ==="
timeout 4200 env RECT=0 python scripts/profile_fused.py 2>&1 | grep -v WARNING | tail -18

echo "=== [2/3] pass-group ablation (K=256 B=2 U=2 production shape) ==="
timeout 2400 env ABLATE=full,fwd,noexp,nomxu,min,bf16,elem16 CHUNK=256 B=2 U=1 \
  python scripts/profile_fused_ablate.py 2>&1 | grep -v WARNING | tail -12

echo "=== [3/3] mapping iteration breakdown ==="
timeout 2400 python scripts/profile_map_iter.py 2>&1 | grep -v WARNING | tail -10
echo "=== r4e sequence done ==="
