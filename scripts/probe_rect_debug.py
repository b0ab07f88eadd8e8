"""Rect16x8 divergence triage, stage 2: per-tile INTERNALS of the fused
tracking kernel via RasterConfig.debug_loss (spare loss-row lanes), compared
against host-side expectations computed from the XLA blend outputs.

Runs a square-tile (px=256) control first — if any debug lane diverges
there, the lanes themselves are untrustworthy. Then rect (px=128): the
first lane that diverges localizes the Mosaic mis-lowering:

  lane 2  mask count      -> S / gt gating
  lane 3  sum(S)          -> phase-A weight accumulation
  lane 5  executed chunks -> SMEM early-exit chain
  lane 6  sum(gt depth)   -> gt block row reads
  lane 7  sum(gt color)   -> gt block row reads
  lane 8  sum(C)          -> color accumulators
  lane 9  unmasked |dC|   -> loss reduction itself
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.instances import blend_packed_xla
from gsorb_slam_tpu.raster.pallas_raster import (
    _pack_instances,
    tile_gt_images,
    tracking_loss_grad,
)
from gsorb_slam_tpu.raster.tiled import render_tiled
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map

LANES = {
    0: "im_w*loss_color",
    1: "depth_w*loss_depth",
    2: "sum(mask)",
    3: "sum(S)",
    4: "max(S)",
    5: "executed_chunks",
    6: "sum(gt_depth)",
    7: "sum(gt_rgb)",
    8: "sum(C_rgb)",
    9: "unmasked |dC| L1",
    10: "masked-gtd |dD| L1",
    11: "sum(depth_pred)",
}


def tile_sums(arr2d, H, W, tsy, tsx):
    ty, tx = -(-H // tsy), -(-W // tsx)
    a = np.pad(arr2d, ((0, ty * tsy - H), (0, tx * tsx - W)))
    return a.reshape(ty, tsy, tx, tsx).sum((1, 3)).reshape(-1)


def tile_max(arr2d, H, W, tsy, tsx):
    ty, tx = -(-H // tsy), -(-W // tsx)
    a = np.pad(arr2d, ((0, ty * tsy - H), (0, tx * tsx - W)))
    return a.reshape(ty, tsy, tx, tsx).max((1, 3)).reshape(-1)


def run_case(label, tile_h):
    W, H, N, CAP = 640, 480, 60_000, 1 << 16
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(0.8, 4.0, N)], -1).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(gm, jnp.asarray(means),
                    jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
                    jnp.asarray(means[:, 2]), jnp.ones(N, bool), cam.fx, cam.fy)
    T = jnp.eye(4)
    cfg = RasterConfig(tile=16, tile_h=tile_h, tile_capacity=1024, max_dup=16,
                       chunk=256, chunk_unroll=2, fused_tiles_per_step=2,
                       dilate_px=8.0, exact_stop=False, debug_loss=True)
    tsy, tsx = cfg.tile_h_px, cfg.tile_w_px
    prep = jax.jit(lambda: preprocess(gm.means, gm.rgb, gm.quats,
                                      gm.logit_opacities, gm.log_scales,
                                      gm.active, T, cam))()
    bins = jax.jit(lambda: bin_gaussians(prep, cam, cfg))()
    packed = jax.jit(lambda: _pack_instances(prep, bins))()
    o = jax.jit(lambda p: blend_packed_xla(p, bins.counts, cam, cfg))(packed)
    ref = jax.jit(lambda p: render_tiled(p, bins, cam, cfg))(prep)
    gt_color = np.asarray(jax.lax.stop_gradient(ref.color))
    gt_depth = np.asarray(jax.lax.stop_gradient(
        jnp.where(ref.alpha > 0.5, ref.median_depth, 0.0)))
    gt4 = tile_gt_images(jnp.asarray(gt_color), jnp.asarray(gt_depth), cam, cfg)

    _, _, _, rows = jax.jit(
        lambda p: tracking_loss_grad(p, bins.counts, gt4, cam, cfg,
                                     0.7, 1.0, False, interpret=False,
                                     return_tile_rows=True)
    )(packed)
    rows = np.asarray(rows[:, 0, :])  # [T, px]

    alpha = np.asarray(o.alpha)
    color = np.asarray(o.color)
    depth = np.asarray(o.depth)
    mask = ((alpha > 0.99) & (gt_depth > 0)).astype(np.float32)
    dC = np.abs(color - gt_color).sum(-1)
    exp = {
        0: 0.7 * tile_sums(dC * mask, H, W, tsy, tsx),
        1: 1.0 * tile_sums(np.abs(depth - gt_depth) * mask, H, W, tsy, tsx),
        2: tile_sums(mask, H, W, tsy, tsx),
        3: tile_sums(alpha, H, W, tsy, tsx),
        4: tile_max(alpha, H, W, tsy, tsx),
        6: tile_sums(gt_depth, H, W, tsy, tsx),
        7: tile_sums(gt_color.sum(-1), H, W, tsy, tsx),
        8: tile_sums(color.sum(-1), H, W, tsy, tsx),
        9: tile_sums(dC, H, W, tsy, tsx),
        10: tile_sums(np.abs(depth - gt_depth) * (gt_depth > 0), H, W, tsy, tsx),
        11: tile_sums(depth, H, W, tsy, tsx),
    }
    K = cfg.chunk
    n_chunks_ub = np.ceil(np.asarray(bins.counts) / K)

    print(f"--- {label} (tile {tsx}x{tsy}, px={tsx*tsy}) ---", flush=True)
    worst_lane, worst_rel = None, 0.0
    for ln, name in LANES.items():
        got = rows[:, ln]
        if ln == 5:
            ub = n_chunks_ub
            over = np.sum(got > ub + 0.5)
            print(f"  lane {ln:2d} {name:20s}: mean {got.mean():8.2f} "
                  f"ub-mean {ub.mean():8.2f} over-ub-tiles {over}", flush=True)
            continue
        want = exp[ln]
        d = np.abs(got - want)
        scale = max(np.abs(want).max(), 1e-6)
        rel = d.max() / scale
        tag = "OK " if rel < 2e-2 else "DIVERGED"
        print(f"  lane {ln:2d} {name:20s}: max|d| {d.max():10.4f} "
              f"rel {rel:.2e}  sum got/want {got.sum():12.2f}/{want.sum():12.2f}"
              f"  {tag}", flush=True)
        if rel > worst_rel:
            worst_rel, worst_lane = rel, ln
    if worst_rel > 2e-2:
        ln = worst_lane
        want = exp[ln]
        d = np.abs(rows[:, ln] - want)
        bad = np.argsort(-d)[:8]
        ty, tx = -(-H // tsy), -(-W // tsx)
        print(f"  worst lane {ln} tiles (id, row, col, got, want):", flush=True)
        for t in bad:
            print(f"    {t:5d} ({t // tx:3d},{t % tx:3d}) "
                  f"{rows[t, ln]:10.4f} {want[t]:10.4f}", flush=True)


def main():
    run_case("control square", 0)
    run_case("rect 16x8", 8)
    # A/B: neutralize the per-chunk early-exit chain (STOP_T is read at
    # trace time) — if rect converges with it off, the SMEM/pl.when exit
    # path is the mis-lowered mechanism.
    import gsorb_slam_tpu.raster.pallas_raster as PR

    PR.STOP_T = 0.0
    run_case("rect 16x8, early-exit OFF", 8)
    PR.STOP_T = 1e-4


if __name__ == "__main__":
    main()
