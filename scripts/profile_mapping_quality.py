"""Isolate MAPPING quality from tracking: drive System on TUMLikeDataset
frames with ground-truth poses injected (tracking skipped), reference
budgets, and report PSNR / depth-L1 / splat count per ablation.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_mapping_quality.py [--frames 15] [--wh 320 240]

Ablations (env QABLATE=name):
  base         - production settings
  freshbins    - bins_ttl=0, refresh all window KFs every frame
  lr2          - 2x mean/scale/rot LRs
  lrhalf       - 0.5x
"""

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import (
    CameraConfig, MappingConfig, ORBConfig, SystemConfig, TrackingConfig,
)
from gsorb_slam_tpu.ops.metrics import psnr
from gsorb_slam_tpu.raster import RasterConfig
from gsorb_slam_tpu.slam.dataset import TUMLikeDataset
from gsorb_slam_tpu.slam.system import System


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--wh", type=int, nargs=2, default=(320, 240))
    ap.add_argument("--map-iters", type=int, default=100)
    ap.add_argument("--ablate", default=os.environ.get("QABLATE", "base"))
    ap.add_argument("--max-gaussians", type=int, default=1 << 19)
    args = ap.parse_args()
    W, H = args.wh

    ds = TUMLikeDataset(
        n_frames=args.frames, seed=0, width=W, height=H,
        apply_distortion=False, noise=True,
        cache_dir="/tmp/gsorb_bench_cache",
    )
    cam = ds.cam

    mcfg = dict(
        num_iters=args.map_iters, max_gaussians=args.max_gaussians,
        window_size=8, covis_window=4,
    )
    if args.ablate == "lr2":
        mcfg.update(lr_mean3d=2e-4, lr_log_scales=2e-3, lr_unnorm_rotation=2e-3)
    if args.ablate == "lrhalf":
        mcfg.update(lr_mean3d=5e-5, lr_log_scales=5e-4,
                    lr_unnorm_rotation=5e-4)

    cfg = SystemConfig(
        camera=CameraConfig(width=W, height=H, fx=cam.fx, fy=cam.fy,
                            cx=cam.cx, cy=cam.cy, fps=30),
        orb=ORBConfig(),
        mapping=MappingConfig(**mcfg),
        tracking=TrackingConfig(num_iters=1),
    )
    rcfg = RasterConfig(tile=16, tile_capacity=2048, max_dup=16, chunk=128,
                        dilate_px=4.0)
    sys_ = System(cfg, max_keyframes=32, raster=rcfg, frontend="render")
    if args.ablate == "freshbins":
        sys_.bins_ttl = 0
        sys_.bins_refresh_per_frame = 10**6

    t_all = time.time()
    for i in range(len(ds)):
        fr = ds[i]
        t0 = time.time()
        sys_.track_rgbd(
            fr.rgb, fr.depth, fr.timestamp, gt_pose=fr.gt_T_cw,
        )
        n = int(sys_.gm.count)
        add = sys_.densify_added[-1] if sys_.densify_added else 0
        print(f"frame {i}: {time.time()-t0:.1f}s splats={n} added={add}",
              flush=True)

    # Evaluate renders at GT poses vs GT images.
    ps, dl1 = [], []
    for i in range(len(ds)):
        fr = ds[i]
        out = sys_._render_jit(
            sys_.gm, jnp.asarray(fr.gt_T_cw),
            sys_._bin_jit(sys_.gm, jnp.asarray(fr.gt_T_cw)),
        )
        mask = fr.depth > 0
        ps.append(float(psnr(out.color, jnp.asarray(fr.rgb),
                             jnp.asarray(mask))))
        d = np.asarray(out.median_depth)
        dl1.append(float(np.abs(d - fr.depth)[mask & (d > 0)].mean()))
    print(f"ABLATE={args.ablate} frames={args.frames} "
          f"psnr={np.mean(ps):.2f} depth_l1={np.mean(dl1):.4f} "
          f"splats={int(sys_.gm.count)} wall={time.time()-t_all:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
