"""Component budget of the paired-rect vs square tracking iteration at the
bench workload (VGA, 250k splats): kernel alone, preprocess VJP, pack
gather, rebin. Attributes the end-to-end gap probe_paired_tpu measures.

Usage: python scripts/profile_paired_parts.py
"""

import dataclasses as dc
import functools
import time

import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.transforms import matrix_to_pose, pose_to_matrix
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.binning import TileBins, tile_grid_shape
from gsorb_slam_tpu.raster.instances import pack_raw_instances
from gsorb_slam_tpu.raster.pallas_raster import (
    _pack_instances,
    tile_gt_images,
    tracking_loss_grad,
)
from gsorb_slam_tpu.raster.paired import (
    count_sorted_pair_permutation,
    pack_gt_pairs,
    tracking_loss_grad_paired,
)
from gsorb_slam_tpu.raster.preprocess_pallas import (
    preprocess_instances_pallas,
    rt_from_matrix,
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
    print(f"{name:52s} {per*1e3:9.3f} ms/iter", flush=True)
    return per


def main() -> int:
    W, H, N, CAP = 640, 480, 250_000, 1 << 18
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(0.8, 4.0, N)], -1).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(gm, jnp.asarray(means),
                    jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
                    jnp.asarray(means[:, 2]), jnp.ones(N, bool),
                    cam.fx, cam.fy)
    T = jnp.eye(4)
    sq = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=256,
                      chunk_unroll=2, fused_tiles_per_step=2, dilate_px=2.0,
                      exact_stop=False, blend_bf16=True, elem_bf16=True)
    import os

    pk = int(os.environ.get("GSORB_PAIRED_K", "256"))
    pb = int(os.environ.get("GSORB_PAIRED_B", "2"))
    pu = int(os.environ.get("GSORB_PAIRED_U", "2"))
    pr = dc.replace(sq, paired=True, tile_h=8, tile_capacity=768, chunk=pk,
                    fused_tiles_per_step=pb, chunk_unroll=pu)

    prep = jax.jit(lambda: preprocess(gm.means, gm.rgb, gm.quats,
                                      gm.logit_opacities, gm.log_scales,
                                      gm.active, T, cam))()
    ref = jax.jit(lambda: render_tiled(
        prep, bin_gaussians(prep, cam, sq), cam, sq))()
    gt_color = jax.lax.stop_gradient(ref.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(ref.alpha > 0.5, ref.median_depth, 0.0))

    # --- square components ---
    bins_s = jax.jit(lambda: bin_gaussians(prep, cam, sq))()
    packed_s = jax.jit(lambda: _pack_instances(prep, bins_s))()
    gt4_s = tile_gt_images(gt_color, gt_depth, cam, sq)
    print(f"# square instances {int(jnp.sum(bins_s.counts))}", flush=True)

    def mk_ker_s(cnts, label):
        def st(c):
            img, dep, g = tracking_loss_grad(
                c, cnts, gt4_s, cam, sq, 0.7, 1.0, False,
                interpret=False)
            return c + g * 0 + (img + dep) * 0
        timeit_loop(label, st, packed_s)

    mk_ker_s(bins_s.counts, f"square kernel alone (K={sq.chunk} elem16)")
    # fixed-vs-per-chunk decomposition: the SAME compiled program with
    # counts clamped (counts are runtime data) — 0 chunks = pure per-tile
    # fixed cost (loss block, zeroing, phase setup), K / 2K = +1 / +2
    # chunk-trips per tile.
    for clamp in (0, 1, 2):
        mk_ker_s(jnp.minimum(bins_s.counts, clamp * sq.chunk),
                 f"square kernel counts<= {clamp}*K")

    # --- paired components ---
    bins_r = jax.jit(lambda: bin_gaussians(prep, cam, pr))()
    perm = jax.jit(lambda: count_sorted_pair_permutation(bins_r.counts))()
    bins_p = TileBins(indices=bins_r.indices[perm], counts=bins_r.counts[perm],
                      n_dropped=bins_r.n_dropped)
    packed_p = jax.jit(lambda: _pack_instances(prep, bins_p))()
    gt4_p = jax.jit(lambda: pack_gt_pairs(gt_color, gt_depth, cam, pr,
                                          perm=perm))()
    print(f"# paired instances {int(jnp.sum(bins_r.counts))} "
          f"K={pk} B={pb} U={pu}", flush=True)

    def mk_ker_p(cnts, label):
        def st(c):
            img, dep, g = tracking_loss_grad_paired(
                c, cnts, gt4_p, cam, pr, 0.7, 1.0, False,
                interpret=False, tile_ids=perm)
            return c + g * 0 + (img + dep) * 0
        timeit_loop(label, st, packed_p)

    mk_ker_p(bins_p.counts, f"paired kernel alone (K={pk} elem16)")
    for clamp in (0, 1, 2):
        mk_ker_p(jnp.minimum(bins_p.counts, clamp * pk),
                 f"paired kernel counts<= {clamp}*K")

    # --- preprocess VJP at both packs ---
    raw_s = jax.jit(lambda: pack_raw_instances(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, bins_s))()
    raw_p = jax.jit(lambda: pack_raw_instances(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, bins_p))()
    q0, t0_ = matrix_to_pose(T)

    def mk_pp(raw):
        def st(c):
            q = q0 + c[0] * 0
            screen, vjp = jax.vjp(
                lambda q_, t_: preprocess_instances_pallas(
                    raw, rt_from_matrix(pose_to_matrix(q_, t_)), cam,
                    1.0, 8, False),
                q, t0_)
            gq, gt_ = vjp(jax.tree.map(jnp.ones_like, screen))
            return c + jnp.concatenate([gq, gt_]) * 0
        return st

    x0 = jnp.zeros((7,), jnp.float32)
    timeit_loop("preprocess VJP square pack", mk_pp(raw_s), x0)
    timeit_loop("preprocess VJP paired pack", mk_pp(raw_p), x0)

    # --- pack gather ---
    def st_pack_s(c):
        return c + _pack_instances(prep, bins_s)[0, 0, 0] * 0
    timeit_loop("pack gather square", st_pack_s, x0)

    def st_pack_p(c):
        return c + _pack_instances(prep, bins_p)[0, 0, 0] * 0
    timeit_loop("pack gather paired (incl perm)", st_pack_p, x0)

    # --- binning (the rebin episode cost) ---
    def st_bin_s(c):
        b = bin_gaussians(prep, cam, sq)
        return c + b.counts[0].astype(jnp.float32) * 0
    timeit_loop("bin_gaussians square", st_bin_s, x0)

    def st_bin_p(c):
        b = bin_gaussians(prep, cam, pr)
        p_ = count_sorted_pair_permutation(b.counts)
        return c + (b.counts[0] + p_[0]).astype(jnp.float32) * 0
    timeit_loop("bin_gaussians rect + sort-perm", st_bin_p, x0)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
