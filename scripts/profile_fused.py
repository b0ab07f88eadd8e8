"""Sweep the fused tracking kernel's tuning knobs on the TPU at the
production VGA workload: fused_tiles_per_step (B), chunk_unroll (U),
blend_bf16, chunk. Reports ms/iter for the kernel alone and for the full
tracking iteration (preprocess VJP + kernel)."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.instances import pack_raw_instances, preprocess_instances
from gsorb_slam_tpu.raster.pallas_raster import (
    _pack_instances,
    tile_gt_images,
    tracking_loss_grad,
)
from gsorb_slam_tpu.raster.tiled import render_tiled
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map

R = 10


def timeit_loop(name, step_fn, x0, reps=3, r=R):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), x)

    jax.block_until_ready(run(x0, r))
    jax.block_until_ready(run(x0, 0))
    best_full, best_zero = float("inf"), float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, r))
        best_full = min(best_full, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, 0))
        best_zero = min(best_zero, time.perf_counter() - t0)
    per = (best_full - best_zero) / r
    print(f"{name:58s} {per*1e3:9.3f} ms/iter", flush=True)
    return per


def feed(carry, out):
    leaves = jax.tree_util.tree_leaves(out)
    eps = sum(jnp.sum(l[..., :1].astype(jnp.float32) * 0) for l in leaves)
    return jax.tree.map(
        lambda a: a + eps.astype(a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        carry,
    )


def main():
    W, H, N, CAP = 640, 480, 250_000, 1 << 18
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(0.8, 4.0, N)], -1).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(gm, jnp.asarray(means),
                    jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
                    jnp.asarray(means[:, 2]), jnp.ones(N, bool), cam.fx, cam.fy)
    T_cw = jnp.eye(4)

    base = dict(tile=16, tile_capacity=1024, max_dup=16, dilate_px=2.0,
                exact_stop=False)
    rcfg0 = RasterConfig(chunk=128, **base)
    prep = jax.jit(lambda: preprocess(gm.means, gm.rgb, gm.quats,
                                      gm.logit_opacities, gm.log_scales,
                                      gm.active, T_cw, cam))()
    bins = jax.jit(lambda: bin_gaussians(prep, cam, rcfg0))()
    jax.block_until_ready(bins.indices)
    M = int(jnp.sum(bins.counts))
    print(f"instances: {M}  tiles: {bins.indices.shape[0]}", flush=True)

    packed = jax.jit(lambda: _pack_instances(prep, bins))()
    out0 = jax.jit(lambda p: render_tiled(p, bins, cam, rcfg0))(prep)
    gt_c = jax.lax.stop_gradient(out0.color)
    gt_d = jax.lax.stop_gradient(
        jnp.where(out0.alpha > 0.5, out0.median_depth, 0.0))
    gt4 = tile_gt_images(gt_c, gt_d, cam, rcfg0)
    raw = jax.jit(lambda: pack_raw_instances(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, bins))()

    configs = []
    for B in (1, 2, 4, 8):
        configs.append((f"B={B} U=4 f32 K=128",
                        RasterConfig(chunk=128, chunk_unroll=4,
                                     fused_tiles_per_step=B, **base)))
    for U in (2, 8):
        configs.append((f"B=4 U={U} f32 K=128",
                        RasterConfig(chunk=128, chunk_unroll=U,
                                     fused_tiles_per_step=4, **base)))
    configs.append(("B=4 U=4 bf16 K=128",
                    RasterConfig(chunk=128, chunk_unroll=4, blend_bf16=True,
                                 fused_tiles_per_step=4, **base)))
    configs.append(("B=2 U=2 f32 K=256",
                    RasterConfig(chunk=256, chunk_unroll=2,
                                 fused_tiles_per_step=2, **base)))
    configs.append(("B=2 U=2 bf16 K=256",
                    RasterConfig(chunk=256, chunk_unroll=2, blend_bf16=True,
                                 fused_tiles_per_step=2, **base)))
    configs.append(("B=2 U=2 elem16 K=256",
                    RasterConfig(chunk=256, chunk_unroll=2, elem_bf16=True,
                                 fused_tiles_per_step=2, **base)))
    configs.append(("B=4 U=4 elem16 K=128",
                    RasterConfig(chunk=128, chunk_unroll=4, elem_bf16=True,
                                 fused_tiles_per_step=4, **base)))

    best = None
    for name, cfg in configs:
        def st(c, cfg=cfg):
            img, dep, g = tracking_loss_grad(
                c, bins.counts, gt4, cam, cfg, 0.7, 1.0, True)
            return feed(c, g)
        per = timeit_loop(f"FUSED {name}", st, packed)
        if best is None or per < best[1]:
            best = (name, per)

    print(f"best: {best[0]} {best[1]*1e3:.3f} ms", flush=True)

    # Rectangular tiles (16x8, px=128): separate binning geometry — fresh
    # bins/pack/gt4 per tile shape. Expect ~1.6x less slab element work at
    # ~1.25x duplication (PLAN r4 roadmap item 4).
    import os

    if os.environ.get("RECT", "1") != "0":
        base_r = dict(base, tile_h=8)
        for tag, extra in (("f32", {}), ("bf16", {"blend_bf16": True})):
            cfg_r = RasterConfig(chunk=128, chunk_unroll=4,
                                 fused_tiles_per_step=4, **base_r, **extra)
            bins_r = jax.jit(lambda cfg_r=cfg_r: bin_gaussians(
                prep, cam, cfg_r))()
            jax.block_until_ready(bins_r.indices)
            Mr = int(jnp.sum(bins_r.counts))
            packed_r = jax.jit(
                lambda bins_r=bins_r: _pack_instances(prep, bins_r))()
            gt4_r = tile_gt_images(gt_c, gt_d, cam, cfg_r)

            def st_r(c, cfg_r=cfg_r, bins_r=bins_r, gt4_r=gt4_r):
                img, dep, g = tracking_loss_grad(
                    c, bins_r.counts, gt4_r, cam, cfg_r, 0.7, 1.0, True)
                return feed(c, g)

            per = timeit_loop(
                f"FUSED rect16x8 B=4 U=4 {tag} (inst {Mr} vs {M})",
                st_r, packed_r)

    # full tracking iteration with the best-ish config (B=4 U=4)
    cfg = RasterConfig(chunk=128, chunk_unroll=4, fused_tiles_per_step=4, **base)

    def st_full(c):
        def f(t4):
            screen, vjp = jax.vjp(
                lambda tt: preprocess_instances(raw, tt, cam), t4)
            img, dep, d_screen = tracking_loss_grad(
                screen, bins.counts, gt4, cam, cfg, 0.7, 1.0, True)
            (gt_,) = vjp(d_screen)
            return img + dep + jnp.sum(gt_ * 0)
        return feed(c, f(c)[None])
    timeit_loop("FULL ITER (preprocess vjp + fused B=4)", st_full, T_cw)


if __name__ == "__main__":
    main()
