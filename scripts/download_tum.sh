#!/usr/bin/env bash
# TUM RGB-D fetch (reference scripts/dataset_utils/download_tum.sh).
set -e
mkdir -p datasets/TUM_RGBD && cd datasets/TUM_RGBD
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz rgbd_dataset_freiburg3_long_office_household; do
  [ -d "$seq" ] && continue
  fr=$(echo "$seq" | cut -d_ -f3)
  wget "https://cvg.cit.tum.de/rgbd/dataset/${fr}/${seq}.tgz" -O "${seq}.tgz"
  tar xzf "${seq}.tgz" && rm "${seq}.tgz"
done
