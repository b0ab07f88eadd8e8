#!/bin/bash
# Round-4 TPU sequence A: bf16 quality gate + host-cost recheck + bench.
# Run UNBOUNDED per job (killing a client mid-remote-compile wedges the
# axon relay); each job is individually timeout-bounded well above its
# expected runtime.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/4] bf16-blend quality twins (15f QVGA, f32 vs bf16) ==="
for mode in f32 bf16; do
  extra=""
  if [ "$mode" = "bf16" ]; then extra="--blend-bf16"; fi
  timeout 2400 python -m gsorb_slam_tpu.apps.run_benchmark \
    --frames 15 --width 320 --height 240 \
    --track-iters 100 --map-iters 50 \
    --dilate 4 $extra \
    --bucket-floor 131072 \
    --out experiments/r4_qvga_blend_${mode} 2>&1 | tail -6
done

echo "=== [2/4] QVGA full-budget e2e (jitted frontend host-cost check) ==="
timeout 4800 python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 40 --width 320 --height 240 \
  --track-iters 200 --map-iters 100 \
  --dilate 4 \
  --bucket-floor 131072 \
  --out experiments/tum_like_qvga_r4 2>&1

echo "=== [3/4] bench.py (preprocess_pallas on the tracking fast path) ==="
timeout 2400 python bench.py 2>&1 | tail -3

echo "=== [4/4] smoke regate at HEAD ==="
timeout 2400 python scripts/tpu_smoke.py 2>&1 | grep -E "ok |FAIL" | head -30
echo "=== r4 sequence A done ==="
