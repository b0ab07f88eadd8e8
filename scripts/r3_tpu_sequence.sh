#!/bin/bash
# Round-3 TPU work sequence: math gate -> headline bench -> VGA e2e rerun.
# Run UNBOUNDED (first VGA compile generation can take tens of minutes;
# killing a client mid-remote-compile wedges the axon relay — see PLAN.md).
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

echo "=== [1/3] tpu_smoke math gate ==="
python scripts/tpu_smoke.py 2>&1 | tail -15
if [ "${PIPESTATUS[0]}" != "0" ]; then
  echo "SMOKE FAILED — aborting sequence"
  exit 1
fi

echo "=== [2/3] bench.py ==="
python bench.py 2>&1 | tail -25

echo "=== [2b] fused-kernel ablation (timing: is packed bf16 2x?) ==="
ABLATE=full,bf16,elem16,fwd python scripts/profile_fused_ablate.py 2>&1 | tail -8

echo "=== [3/4] VGA e2e (200/100 iters, dilate 4, rebin 8/40/120) ==="
python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 60 --track-iters 200 --map-iters 100 \
  --dilate 4 --rebin-iters 8 40 120 \
  --bucket-floor 524288 \
  --out experiments/tum_like_vga_r3 2>&1

echo "=== [4/5] QVGA e2e at the reference budget (200/100 iters) ==="
python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 40 --width 320 --height 240 \
  --track-iters 200 --map-iters 100 \
  --dilate 4 \
  --bucket-floor 131072 \
  --out experiments/tum_like_qvga_r3 2>&1

echo "=== [5/5] QVGA with loop closing live (reference parity: use_loop on) ==="
python -m gsorb_slam_tpu.apps.run_benchmark \
  --frames 60 --width 320 --height 240 \
  --track-iters 100 --map-iters 60 \
  --dilate 4 --loop \
  --bucket-floor 131072 \
  --out experiments/tum_like_qvga_loop 2>&1
echo "=== sequence done ==="
