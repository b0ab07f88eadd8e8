#!/bin/bash
# Wait for the axon relay to recover (attach-only probes, safe to kill),
# then run the full round-3 TPU sequence exactly once.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

probe() {
  timeout 120 env JAX_PLATFORMS=axon python -c \
    "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null
}

echo "[wait_and_run_r3] probing for TPU..." >&2
until probe; do
  echo "[wait_and_run_r3] $(date +%H:%M:%S) relay still down" >&2
  sleep 300
done

echo "[wait_and_run_r3] TPU back at $(date +%H:%M:%S); starting sequence" >&2
touch /tmp/r3_running
bash scripts/r3_tpu_sequence.sh 2>&1 | tee /tmp/r3_sequence.log
rm -f /tmp/r3_running
echo "[wait_and_run_r3] sequence finished at $(date +%H:%M:%S)" >&2
