"""Isolate where track_frame's per-iteration time goes vs the bare fused
kernel loop: rebin cost, while_loop structure, chi2/adam overhead."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import TrackingConfig
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.slam.tracking import FeatureMatches, track_frame
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map

W, H, N, CAP, ITERS = 640, 480, 250_000, 1 << 18, 50
cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
rcfg = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=128,
                    dilate_px=2.0, exact_stop=False)

rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                  rng.uniform(0.8, 4.0, N)], -1).astype(np.float32)
gm = empty_map(CAP)
gm = add_points(gm, jnp.asarray(means),
                jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
                jnp.asarray(means[:, 2]), jnp.ones(N, bool), cam.fx, cam.fy)
T_gt = jnp.eye(4)
prep = preprocess(gm.means, gm.rgb, gm.quats, gm.logit_opacities,
                  gm.log_scales, gm.active, T_gt, cam)
bins = bin_gaussians(prep, cam, rcfg)
from gsorb_slam_tpu.raster.tiled import render_tiled
out = jax.jit(lambda p: render_tiled(p, bins, cam, rcfg))(prep)
gt_color = jax.lax.stop_gradient(out.color)
gt_depth = jax.lax.stop_gradient(jnp.where(out.alpha > 0.5, out.median_depth, 0.0))
T_init = jnp.eye(4).at[:3, 3].set(jnp.array([0.01, -0.005, 0.008]))


def timed(name, fn, *args):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:50s} {best*1e3:8.1f} ms  ({best/ITERS*1e3:6.2f} ms/iter)",
          flush=True)


variants = {
    "bench config (rebin@16, while_loop)": TrackingConfig(
        num_iters=ITERS, early_stop_delta=0.0),
    "no rebin": TrackingConfig(
        num_iters=ITERS, early_stop_delta=0.0, rebin_iters=()),
}
for name, tcfg in variants.items():
    run = jax.jit(lambda gm, T0, tcfg=tcfg: track_frame(
        gm, T0, gt_color, gt_depth, FeatureMatches.empty(), cam, tcfg, rcfg,
        num_iters=ITERS, bins=bins).T_cw)
    timed(name, run, gm, T_init)
