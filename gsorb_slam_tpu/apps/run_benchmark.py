"""Full-system benchmark on the TUM-like synthetic sequence.

The driver for the reference protocol (``scripts/run_tum.sh``: N rounds per
sequence, per-run ``experiments/<name>/`` outputs with trajectory,
``result.txt``) pointed at :class:`slam.dataset.TUMLikeDataset` — the
zero-egress stand-in for fr1 (see the dataset docstring). Reports ATE RMSE,
per-frame timing, and render quality (PSNR/SSIM over the estimated
trajectory), writing the same artifact set the reference leaves behind.

Usage:
    python -m gsorb_slam_tpu.apps.run_benchmark --frames 100 \
        --track-iters 50 --map-iters 30 --out experiments/tum_like
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--track-iters", type=int, default=200)
    ap.add_argument("--map-iters", type=int, default=100)
    ap.add_argument("--no-distortion", action="store_true")
    ap.add_argument("--no-noise", action="store_true")
    ap.add_argument("--frontend", default="orb", choices=["orb", "render"])
    ap.add_argument("--max-gaussians", type=int, default=1 << 20)
    ap.add_argument("--out", default="experiments/tum_like")
    ap.add_argument("--eval-stride", type=int, default=1)
    ap.add_argument("--cache", default="/tmp/gsorb_bench_cache")
    # Binning-freshness experiment knobs (tracking-gradient fidelity vs
    # rebin cost; the reference re-sorts EVERY iteration).
    ap.add_argument("--dilate", type=float, default=None,
                    help="override RasterConfig.dilate_px")
    ap.add_argument("--rebin-iters", type=int, nargs="*", default=None,
                    help="override in-loop tracking rebin iterations")
    ap.add_argument("--bucket-floor", type=int, default=0,
                    help="floor for the live-splat program bucket (pay one "
                         "compile generation when the final size is known)")
    ap.add_argument("--blend-bf16", action="store_true",
                    help="bf16 MXU cumsum mode in the blend kernels "
                         "(RasterConfig.blend_bf16) — quality-twin runs "
                         "gate flipping the production default")
    ap.add_argument("--elem-bf16", action="store_true",
                    help="bf16 elementwise slab mode (RasterConfig.elem_bf16;"
                         " production default since r4g — flag kept for twin"
                         " compatibility)")
    ap.add_argument("--no-elem-bf16", action="store_true",
                    help="A/B: force the f32 slab path off the production"
                         " elem_bf16 default")
    ap.add_argument("--no-preprocess-pallas", action="store_true",
                    help="bisect: XLA preprocess chain on the tracking path")
    ap.add_argument("--early-stop-delta", type=float, default=None,
                    help="override TrackingConfig.early_stop_delta "
                         "(0 = static fori path, no early stop)")
    ap.add_argument("--tile-capacity", type=int, default=None,
                    help="override RasterConfig.tile_capacity")
    ap.add_argument("--paired", action="store_true",
                    help="paired-rect tracking kernel (raster/paired.py): "
                         "16x8 rect binning, count-sorted pairing, two "
                         "tiles per 256-lane slab")
    ap.add_argument("--track-capacity", type=int, default=None,
                    help="override RasterConfig.track_tile_capacity "
                         "(the tracking view's per-tile instance cap)")
    ap.add_argument("--track-chunk", type=int, default=None,
                    help="override chunk K for the tracking view (paired "
                         "runs measured best at 128)")
    ap.add_argument("--loop", action="store_true",
                    help="enable loop closing (auto-loads the packaged ORB "
                         "vocabulary; the sinusoidal sweep returns to its "
                         "start, so long runs can close a loop)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gsorb_slam_tpu.core.config import (
        CameraConfig,
        DebugConfig,
        MappingConfig,
        ORBConfig,
        SystemConfig,
        TrackingConfig,
    )
    from gsorb_slam_tpu.eval.ate import ate_rmse
    from gsorb_slam_tpu.eval.trajectory import save_tum
    from gsorb_slam_tpu.ops.losses import ssim
    from gsorb_slam_tpu.ops.metrics import psnr
    from gsorb_slam_tpu.raster import RasterConfig
    from gsorb_slam_tpu.slam.dataset import TUMLikeDataset
    from gsorb_slam_tpu.slam.system import System

    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    ds = TUMLikeDataset(
        n_frames=args.frames, seed=args.seed, width=args.width,
        height=args.height, apply_distortion=not args.no_distortion,
        noise=not args.no_noise, cache_dir=args.cache,
    )
    print(f"dataset built in {time.time()-t0:.1f}s "
          f"({len(ds)} frames {args.width}x{args.height})", flush=True)

    s = args.width / 640.0
    cam = ds.cam
    k1, k2, p1, p2, k3 = (
        TUMLikeDataset.DIST if not args.no_distortion else (0, 0, 0, 0, 0)
    )
    cfg = SystemConfig(
        camera=CameraConfig(
            width=args.width, height=args.height,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, fps=30,
            k1=k1, k2=k2, p1=p1, p2=p2, k3=k3,
            depth_map_factor=1.0,
        ),
        orb=ORBConfig(n_features=1000, n_levels=8),
        mapping=MappingConfig(
            num_iters=args.map_iters, init_iters=min(200, 4 * args.map_iters),
            max_gaussians=args.max_gaussians, madien_mul=10.0,
        ),
        tracking=TrackingConfig(
            num_iters=args.track_iters,
            **({"rebin_iters": tuple(args.rebin_iters)}
               if args.rebin_iters is not None else {}),
            **({"early_stop_delta": args.early_stop_delta}
               if args.early_stop_delta is not None else {}),
        ),
        debug=DebugConfig(use_loop=args.loop),
    )
    raster = None
    if (args.dilate is not None or args.blend_bf16 or args.elem_bf16
            or args.no_elem_bf16 or args.no_preprocess_pallas
            or args.tile_capacity is not None or args.paired
            or args.track_capacity is not None
            or args.track_chunk is not None):
        import dataclasses as _dc

        from gsorb_slam_tpu.slam.system import System as _S

        raster = _S.default_raster_config(args.width)
        if args.dilate is not None:
            raster = _dc.replace(raster, dilate_px=args.dilate)
        if args.blend_bf16:
            raster = _dc.replace(raster, blend_bf16=True)
        if args.elem_bf16:
            raster = _dc.replace(raster, elem_bf16=True)
        if args.no_elem_bf16:
            raster = _dc.replace(raster, elem_bf16=False)
        if args.no_preprocess_pallas:
            raster = _dc.replace(raster, preprocess_pallas=False)
        if args.tile_capacity is not None:
            raster = _dc.replace(raster, tile_capacity=args.tile_capacity)
        if args.paired:
            raster = _dc.replace(raster, paired=True)
        if args.track_capacity is not None:
            raster = _dc.replace(raster, track_tile_capacity=args.track_capacity)
        if args.track_chunk is not None:
            raster = _dc.replace(raster, track_chunk=args.track_chunk)
    sys_ = System(cfg, max_keyframes=128, frontend=args.frontend, raster=raster)
    if args.bucket_floor:
        sys_.prefix_bucket_floor = args.bucket_floor

    # Per-frame progress persists as it happens (frames.jsonl): a run killed
    # mid-sequence (wall-clock budget, relay loss) still leaves its
    # trajectory-error/densify trace in the experiment dir.
    os.makedirs(args.out, exist_ok=True)
    frames_log = open(os.path.join(args.out, "frames.jsonl"), "a", buffering=1)

    est, gt, lat = [], [], []
    for i, fr in enumerate(ds):
        tf = time.time()
        T = sys_.track_rgbd(fr.rgb, fr.depth, fr.timestamp)
        lat.append(time.time() - tf)
        est.append(T)
        gt.append(fr.gt_T_cw)
        # Per-frame diagnostic line: instantaneous pose error vs GT,
        # densify adds, live splat count (r2 verdict: find the VGA densify
        # divergence empirically).
        dR = T[:3, :3] @ fr.gt_T_cw[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        # camera-center error (what ATE measures)
        c_est = -T[:3, :3].T @ T[:3, 3]
        c_gt = -fr.gt_T_cw[:3, :3].T @ fr.gt_T_cw[:3, 3]
        terr = float(np.linalg.norm(c_est - c_gt))
        adds = sys_.densify_added[-1] if sys_.densify_added else 0
        print(f"frame {i}/{len(ds)}  {lat[-1]:.2f}s "
              f"splats={int(sys_.gm.n_active())} adds={adds} "
              f"terr={terr*100:.2f}cm rerr={ang:.3f}deg", flush=True)
        frames_log.write(json.dumps({
            "frame": i, "s": round(lat[-1], 3),
            "splats": int(sys_.gm.n_active()), "adds": int(adds),
            "terr_cm": round(terr * 100, 3), "rerr_deg": round(float(ang), 4),
        }) + "\n")

    rmse = float(ate_rmse(est, gt))
    summ = sys_.shutdown_summary()

    # Render-quality pass over the estimated trajectory (Evalution analog,
    # src/Utils.cc:365-473 — every eval-stride-th frame).
    psnrs, ssims, dl1s = [], [], []
    gt_psnrs, gt_dl1s = [], []
    raw_gt_psnrs = []
    # GT poses re-expressed in the map's gauge (Horn est->gt): the map is
    # only defined up to the rigid gauge the first keyframe pins, so raw
    # GT poses mix that offset into the "map quality at true poses" twin.
    from gsorb_slam_tpu.eval.ate import gauge_align_gt_to_est

    gt_aligned = gauge_align_gt_to_est(est, gt)
    for i in range(0, len(ds), args.eval_stride):
        fr = ds[i]
        out = sys_.render_view(est[i])
        c = np.clip(np.asarray(out.color), 0, 1)
        mask = fr.depth > 0
        psnrs.append(float(psnr(jnp.asarray(c), jnp.asarray(fr.rgb),
                                jnp.asarray(mask))))
        ssims.append(float(ssim(jnp.asarray(c), jnp.asarray(fr.rgb))))
        md = np.asarray(out.median_depth)
        valid = mask & (md > 0)
        if valid.any():
            dl1s.append(float(np.abs(md - fr.depth)[valid].mean()))
        # GT-pose twin: scores the MAP with eval-pose error removed —
        # separates "the map is bad" from "the estimated eval pose
        # misaligns the render" in the depth-L1 gap diagnosis. Uses the
        # gauge-aligned GT pose (see gauge_align_gt_to_est above); the raw
        # unaligned number is kept as psnr_db_gt_pose_raw for reference.
        out_g = sys_.render_view(gt_aligned[i])
        cg = np.clip(np.asarray(out_g.color), 0, 1)
        gt_psnrs.append(float(psnr(jnp.asarray(cg), jnp.asarray(fr.rgb),
                                   jnp.asarray(mask))))
        out_gr = sys_.render_view(fr.gt_T_cw)
        cgr = np.clip(np.asarray(out_gr.color), 0, 1)
        raw_gt_psnrs.append(float(psnr(jnp.asarray(cgr), jnp.asarray(fr.rgb),
                                       jnp.asarray(mask))))
        mdg = np.asarray(out_g.median_depth)
        vg = mask & (mdg > 0)
        if vg.any():
            gt_dl1s.append(float(np.abs(mdg - fr.depth)[vg].mean()))

    os.makedirs(args.out, exist_ok=True)
    save_tum(
        os.path.join(args.out, "CameraTrajectory.txt"),
        [(fr.timestamp, T) for fr, T in zip(ds, est)],
    )
    result = {
        "sequence": f"tum_like_{args.frames}f_seed{args.seed}",
        "frames": len(ds),
        "ate_rmse_m": rmse,
        "psnr_db": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "depth_l1_m": float(np.mean(dl1s)) if dl1s else None,
        "psnr_db_gt_pose": float(np.mean(gt_psnrs)),
        "psnr_db_gt_pose_raw": float(np.mean(raw_gt_psnrs)),
        "depth_l1_m_gt_pose": float(np.mean(gt_dl1s)) if gt_dl1s else None,
        "mean_frame_s": float(np.mean(lat[1:])),
        "median_frame_s": float(np.median(lat[1:])),
        "avg_tracking_s": summ["avg_tracking_s"],
        "avg_mapping_s": summ["avg_mapping_s"],
        "total_frontend_s": summ["total_frontend_s"],
        "total_kf_chain_s": summ["total_kf_chain_s"],
        "avg_kf_chain_s": summ["avg_kf_chain_s"],
        "total_gaussians": summ["total_gaussians"],
        "n_keyframes": summ["n_keyframes"],
        "track_iters": args.track_iters,
        "map_iters": args.map_iters,
        "distortion": not args.no_distortion,
        "frontend": args.frontend,
        "backend": jax.default_backend(),
        "densify_added_mean": summ["densify_added_mean"],
        "densify_added_max": summ["densify_added_max"],
        "capacity_frac": summ["capacity_frac"],
        "loop_events": len(sys_.loop_events),
        # XLA compile seconds (trace+lower+compile) during the run: subtract
        # from the wall-clock phases to read steady state (they reconcile:
        # total_frontend_s/kf include whatever compiles they triggered).
        "compile_s": summ.get("compile_s"),
        # Host-cost attribution (fe.* / kf.* wall-time accumulators).
        **{k: v for k, v in summ.items() if k.startswith(("phase_", "bin_"))},
    }
    # Blended-WEIGHT effect of tile_capacity truncation on the PRODUCTION
    # map at the final pose (vs a drop-nothing oracle capacity) — the
    # honest twin of bin_dropped_frac, which counts instances.
    try:
        from gsorb_slam_tpu.ops.metrics import truncation_weight_report
        from gsorb_slam_tpu.raster.preprocess import preprocess as _pp

        gm = sys_.gm
        prep_f = _pp(gm.means, gm.rgb, gm.quats, gm.logit_opacities,
                     gm.log_scales, gm.active, jnp.asarray(est[-1]),
                     sys_.cam)
        oc = sys_.rcfg.tile_capacity
        while oc < 1 << 15:
            oc *= 2
        rep = truncation_weight_report(
            prep_f, sys_.cam, sys_.rcfg, oracle_capacity=oc)
        result["trunc_weight_dropped_frac"] = round(
            rep["weight_dropped_frac"], 6)
        result["trunc_inst_dropped_frac"] = round(
            rep["inst_dropped_frac"], 6)
        result["trunc_oracle_dropped"] = rep["oracle_dropped"]
    except Exception as e:  # telemetry must never fail the run
        result["trunc_weight_dropped_frac"] = f"error: {e}"
    with open(os.path.join(args.out, "result.txt"), "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
