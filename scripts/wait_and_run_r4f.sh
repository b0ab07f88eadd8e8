#!/bin/bash
# Wait for the axon relay to recover (attach-only probes, safe to kill),
# then run TPU sequence F exactly once.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

probe() {
  timeout 180 env JAX_PLATFORMS=axon python -c \
    "import jax, jax.numpy as jnp; assert jax.devices()[0].platform != 'cpu'; \
jnp.zeros(8).block_until_ready()" 2>/dev/null
}

echo "[wait_and_run_r4f] probing for TPU..." >&2
until probe; do
  echo "[wait_and_run_r4f] $(date +%H:%M:%S) relay still down" >&2
  sleep 300
done

echo "[wait_and_run_r4f] TPU back at $(date +%H:%M:%S); starting sequence" >&2
bash scripts/r4f_tpu_sequence.sh 2>&1 | tee /tmp/r4f_sequence.log
echo "[wait_and_run_r4f] sequence finished at $(date +%H:%M:%S)" >&2
