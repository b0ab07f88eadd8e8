"""Export a TUMLike (or Synthetic) sequence to disk in REAL TUM format so
the stock reference protocol runs against on-disk data with no code edits:

    python scripts/make_tum_disk.py --out datasets/TUM_RGBD/rgbd_dataset_freiburg1_desk \
        --frames 40 [--width 640 --height 480]
    DATA_ROOT=datasets/TUM_RGBD ROUNDS=1 scripts/run_tum.sh --max-frames 40

(VERDICT r3 item 6: rehearse the real-data path end to end — PNG16 depth
x1/5000, rgb.txt/depth.txt association with timestamp jitter,
groundtruth.txt.)
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
    ap.add_argument("--no-noise", action="store_true")
    ap.add_argument("--cache-dir", default=None,
                    help="TUMLike render cache (reuse across exports)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gsorb_slam_tpu.slam.dataset import (
        SyntheticDataset,
        TUMLikeDataset,
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

    export_tum_format(ds, args.out, seed=args.seed)
    print(f"wrote {len(ds)} frames to {args.out} (TUM layout)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
