#!/bin/bash
# Round-5 frame-1 mistrack bisect (VERDICT r4 item 6): 15-frame QVGA at the
# REDUCED budgets deterministically mistracked frame 1 by ~27cm in r4
# (100/50), while 200/100 was healthy. Matrix: budget x {baseline,
# no-preprocess-pallas, no-early-stop} — frames.jsonl carries per-frame
# terr, so frame 1's error is read directly from each run dir.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name ==="
  timeout 2400 python -m gsorb_slam_tpu.apps.run_benchmark \
    --frames 15 --width 320 --height 240 --bucket-floor 131072 \
    --out "experiments/r5_bisect_$name" "$@" 2>&1 | grep -v WARNING | tail -3
  python - "experiments/r5_bisect_$name" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1] + "/frames.jsonl")]
worst = max(rows, key=lambda r: r["terr_cm"])
print(f"  frame1 terr {rows[1]['terr_cm']:.2f} cm; worst frame "
      f"{worst['frame']} = {worst['terr_cm']:.2f} cm")
EOF
}

run b100_50            --track-iters 100 --map-iters 50  --dilate 4
run b100_50_nopp       --track-iters 100 --map-iters 50  --dilate 4 --no-preprocess-pallas
run b100_50_noes       --track-iters 100 --map-iters 50  --dilate 4 --early-stop-delta 0
run b40_60             --track-iters 40  --map-iters 60  --dilate 4
run b40_60_noes        --track-iters 40  --map-iters 60  --dilate 4 --early-stop-delta 0
echo "=== r5 bisect done ==="
