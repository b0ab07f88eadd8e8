"""Stereo sequence driver — the ``Examples/Stereo/stereo_kitti.cc``
equivalent over ``System.track_stereo``.

Usage:
    python -m gsorb_slam_tpu.apps.run_stereo --config configs/tum1.yaml \
        [--dataset /path/to/kitti/sequences/00] [--type kitti|synthetic] \
        [--baseline B_m] [--max-frames N] [--out experiments/stereo1]

``Camera.bf`` from the YAML sets the stereo baseline*fx used for both the
row-wise descriptor matching (``Frame::ComputeStereoMatches``) and the SGBM
densification depth; ``--baseline`` overrides it as ``bf = baseline * fx``.
Writes TUM- and KITTI-format trajectories.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dataset", default=None, help="overrides Dataset.path")
    ap.add_argument("--type", default=None, help="kitti | synthetic")
    ap.add_argument("--baseline", type=float, default=None,
                    help="stereo baseline in meters (overrides Camera.bf)")
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from gsorb_slam_tpu.core.config import load_config
    from gsorb_slam_tpu.eval import trajectory as TRAJ
    from gsorb_slam_tpu.slam.dataset import KittiStereoDataset, StereoSyntheticDataset
    from gsorb_slam_tpu.slam.system import System

    cfg = load_config(args.config)
    if args.baseline is not None:
        cfg = dataclasses.replace(
            cfg, camera=dataclasses.replace(cfg.camera, bf=args.baseline * cfg.camera.fx)
        )
    ds_type = (args.type or cfg.dataset.type or "kitti").lower()
    ds_path = args.dataset or cfg.dataset.path
    out_dir = args.out or os.path.join(
        cfg.eval.save_root_path, cfg.dataset.name + "_stereo"
    )
    os.makedirs(out_dir, exist_ok=True)

    if ds_type == "synthetic":
        from gsorb_slam_tpu.core.camera import Camera

        cam = Camera(
            fx=cfg.camera.fx, fy=cfg.camera.fy, cx=cfg.camera.cx, cy=cfg.camera.cy,
            width=cfg.camera.width, height=cfg.camera.height,
        )
        baseline = cfg.camera.bf / cfg.camera.fx if cfg.camera.bf > 0 else 0.08
        ds = StereoSyntheticDataset(
            cam, baseline, n_frames=args.max_frames or 10, n_splats=4000,
            motion_scale=0.1,
        )
    else:
        ds = KittiStereoDataset(ds_path)

    vocab = None
    if args.vocab:
        from gsorb_slam_tpu.frontend.vocab import load_orbvoc_text

        vocab = load_orbvoc_text(args.vocab)

    system = System(cfg, frontend="orb", vocabulary=vocab)
    n = len(ds) if args.max_frames is None else min(len(ds), args.max_frames)
    print(f"tracking {n} stereo frames ({ds_type}, bf={cfg.camera.bf:.2f}) ...")
    latencies = []
    t_start = time.perf_counter()
    for i in range(n):
        fr = ds[i]
        t0 = time.perf_counter()
        system.track_stereo(fr.left, fr.right, fr.timestamp)
        latencies.append(time.perf_counter() - t0)
        if i % 25 == 0:
            print(f"  frame {i}/{n}  ({latencies[-1]*1e3:.0f} ms)")
    total = time.perf_counter() - t_start

    traj = system.get_trajectory()
    TRAJ.save_tum(os.path.join(out_dir, "CameraTrajectory_TUM.txt"), traj)
    TRAJ.save_kitti(os.path.join(out_dir, "CameraTrajectory_KITTI.txt"), traj)

    summary = system.shutdown_summary()
    summary.update(
        median_frame_s=float(np.median(latencies)),
        mean_frame_s=float(np.mean(latencies)),
        total_s=total,
    )
    print("--- shutdown summary ---")
    for k, v in summary.items():
        print(f"  {k}: {v}")
    with open(os.path.join(out_dir, "result.txt"), "a") as f:
        f.write(json.dumps(summary) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
