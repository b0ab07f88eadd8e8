"""RGB-D sequence driver — the ``Examples/RGB-D/rgbd_tum.cc`` equivalent.

Usage:
    python -m gsorb_slam_tpu.apps.run_rgbd --config Examples/RGB-D/tum/TUM1.yaml \
        [--dataset /path/to/sequence] [--type tum|replica|scannet|synthetic] \
        [--frontend render|orb] [--vocab ORBvoc.txt] [--max-frames N] \
        [--out experiments/run1]

Reads the reference's YAML configs directly, runs the full System over the
sequence, and writes the reference's output contract into ``--out``:
trajectory (TUM + dataset-native formats), ``GaussianModel.ply`` (replay.py
compatible), ``result.txt`` metrics, and the shutdown timing summary
(``SavePlyAndPrintTime`` ``src/Render.cc:167-174``).
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
    ap.add_argument("--type", default=None, help="overrides Dataset.type")
    ap.add_argument("--frontend", default="render", choices=["render", "orb"])
    ap.add_argument("--vocab", default=None, help="ORBvoc.txt for loop closing")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--eval-stride", type=int, default=5)
    ap.add_argument("--no-eval", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gsorb_slam_tpu.core.config import load_config
    from gsorb_slam_tpu.eval import trajectory as TRAJ
    from gsorb_slam_tpu.eval.evaluate import evaluate_sequence
    from gsorb_slam_tpu.eval.ply import save_gaussian_ply
    from gsorb_slam_tpu.slam.dataset import SyntheticDataset, open_dataset
    from gsorb_slam_tpu.slam.system import System

    cfg = load_config(args.config)
    ds_type = args.type or cfg.dataset.type
    ds_path = args.dataset or cfg.dataset.path
    out_dir = args.out or os.path.join(cfg.eval.save_root_path, cfg.dataset.name)
    os.makedirs(out_dir, exist_ok=True)

    if ds_type == "synthetic":
        from gsorb_slam_tpu.core.camera import Camera

        cam = Camera(
            fx=cfg.camera.fx, fy=cfg.camera.fy, cx=cfg.camera.cx, cy=cfg.camera.cy,
            width=cfg.camera.width, height=cfg.camera.height,
        )
        ds = SyntheticDataset(cam, n_frames=args.max_frames or 30, motion_scale=0.2)
    else:
        ds = open_dataset(ds_type, ds_path, cfg.camera.depth_map_factor)

    vocab = None
    if args.vocab:
        from gsorb_slam_tpu.frontend.vocab import load_orbvoc_text

        print(f"loading vocabulary {args.vocab} ...")
        vocab = load_orbvoc_text(args.vocab)

    system = System(cfg, frontend=args.frontend, vocabulary=vocab)
    n = len(ds) if args.max_frames is None else min(len(ds), args.max_frames)
    print(f"tracking {n} frames ({ds_type}, frontend={args.frontend}) ...")
    latencies = []
    t_start = time.perf_counter()
    for i in range(n):
        fr = ds[i]
        t0 = time.perf_counter()
        system.track_rgbd(fr.rgb, fr.depth, fr.timestamp)
        latencies.append(time.perf_counter() - t0)
        if i % 25 == 0:
            print(f"  frame {i}/{n}  ({latencies[-1]*1e3:.0f} ms)")
    total = time.perf_counter() - t_start

    # --- outputs (reference contract) ---
    traj = system.get_trajectory()
    TRAJ.save_tum(os.path.join(out_dir, "CameraTrajectory_TUM.txt"), traj)
    if ds_type == "replica":
        TRAJ.save_replica(os.path.join(out_dir, "CameraTrajectory.txt"), traj)
    elif ds_type == "scannet":
        TRAJ.save_scannet(os.path.join(out_dir, "CameraTrajectory.txt"), traj)
    else:
        TRAJ.save_tum(os.path.join(out_dir, "CameraTrajectory.txt"), traj)

    gm = system.gm
    if cfg.eval.save_ply:
        n_splats = save_gaussian_ply(
            os.path.join(out_dir, "GaussianModel.ply"),
            np.asarray(gm.means), np.asarray(gm.rgb),
            np.asarray(gm.logit_opacities), np.asarray(gm.log_scales),
            np.asarray(gm.quats), np.asarray(gm.active),
        )
        print(f"saved GaussianModel.ply ({n_splats} splats)")

    summary = system.shutdown_summary()
    summary["median_frame_s"] = float(np.median(latencies))
    summary["mean_frame_s"] = float(np.mean(latencies))
    summary["total_s"] = total
    print("--- shutdown summary (SavePlyAndPrintTime contract) ---")
    for k, v in summary.items():
        print(f"  {k}: {v}")

    if not args.no_eval and cfg.eval.enable:
        print("evaluating ...")
        result = evaluate_sequence(system, ds, stride=args.eval_stride)
        result.update(summary)
        with open(os.path.join(out_dir, "result.txt"), "a") as f:
            f.write(json.dumps(result) + "\n")
        print("--- evaluation ---")
        for k in ("ate_rmse", "psnr", "ssim", "ms_ssim", "depth_l1"):
            if k in result:
                print(f"  {k}: {result[k]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
