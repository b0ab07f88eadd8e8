#!/usr/bin/env bash
# Full benchmark sweep (reference run.sh).
bash scripts/run_tum.sh "$@"
bash scripts/run_replica.sh "$@"
bash scripts/run_scannet.sh "$@"
