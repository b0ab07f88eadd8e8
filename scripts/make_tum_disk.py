"""Export a TUMLike (or Synthetic) sequence to disk in a REAL dataset
layout so the stock reference protocols run against on-disk data with no
code edits:

    python scripts/make_tum_disk.py --out datasets/TUM_RGBD/rgbd_dataset_freiburg1_desk \
        --frames 40 [--width 640 --height 480]
    DATA_ROOT=datasets/TUM_RGBD ROUNDS=1 scripts/run_tum.sh --max-frames 40

    python scripts/make_tum_disk.py --format replica --out datasets/Replica/room0 --frames 40
    DATA_ROOT=datasets/Replica ROUNDS=1 scripts/run_replica.sh --max-frames 40

    python scripts/make_tum_disk.py --format scannet --out datasets/Scannet/scene0000_00 --frames 40
    DATA_ROOT=datasets/Scannet ROUNDS=1 scripts/run_scannet.sh --max-frames 40

(VERDICT r3 item 6 / r4 item 8: rehearse the real-data paths end to end —
TUM: PNG16 depth x1/5000, rgb.txt/depth.txt association with timestamp
jitter, groundtruth.txt; Replica: results/frame*.jpg + depth*.png x1/6553.5
+ traj.txt T_wc rows; ScanNet: color/depth/pose dirs, millimeter PNG16.)
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kind", default="tumlike", choices=["tumlike", "synthetic"])
    ap.add_argument("--format", default="tum",
                    choices=["tum", "replica", "scannet"],
                    help="on-disk layout to write")
    ap.add_argument("--no-noise", action="store_true")
    ap.add_argument("--cache-dir", default=None,
                    help="TUMLike render cache (reuse across exports)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gsorb_slam_tpu.slam.dataset import (
        SyntheticDataset,
        TUMLikeDataset,
        export_replica_format,
        export_scannet_format,
        export_tum_format,
    )

    if args.kind == "tumlike":
        ds = TUMLikeDataset(
            n_frames=args.frames, seed=args.seed, width=args.width,
            height=args.height, noise=not args.no_noise,
            cache_dir=args.cache_dir,
        )
    else:
        from gsorb_slam_tpu.core.camera import Camera

        cam = Camera(fx=90.0, fy=90.0, cx=args.width / 2, cy=args.height / 2,
                     width=args.width, height=args.height)
        ds = SyntheticDataset(cam, n_frames=args.frames, seed=args.seed)

    if args.format == "tum":
        export_tum_format(ds, args.out, seed=args.seed)
    elif args.format == "replica":
        export_replica_format(ds, args.out)
    else:
        export_scannet_format(ds, args.out)
    print(f"wrote {len(ds)} frames to {args.out} ({args.format} layout)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
