"""Micro-profile of the raster hot path on the attached accelerator.

Methodology note: the attached TPU is reached through a tunnel with a
~30 ms per-dispatch round trip, so single-call timings are floor-limited.
Every measurement here therefore loops the op R times INSIDE one jitted
program (a lax.fori_loop with a data dependency between iterations) and
reports (total - overhead) / R.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.instances import pack_raw_instances, preprocess_instances
from gsorb_slam_tpu.raster.pallas_raster import _pack_instances, blend_and_untile
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map

R = 10  # inner repetitions per timed program


def timeit_loop(name, step_fn, x0, reps=3, r=R):
    """step_fn: carry -> carry with the op inside. Times r iterations in ONE
    dispatch; per-iter = (t_loop - t_zero) / r using a 0-trip calibration."""

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
    print(f"{name:58s} {per*1e3:9.3f} ms/iter")
    return per


def feed(carry, out):
    """Make the next iteration depend on this one's output (defeats DCE and
    cross-iteration overlap-free measurement) at negligible cost."""
    leaves = jax.tree_util.tree_leaves(out)
    eps = sum(jnp.sum(l[..., :1].astype(jnp.float32) * 0) for l in leaves)
    return jax.tree.map(
        lambda a: a + eps.astype(a.dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        carry,
    )


def main():
    W, H, N, CAP = 640, 480, 250_000, 1 << 18
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    dilate = 2.0
    rcfg = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=256,
                        dilate_px=dilate, exact_stop=False)
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(0.8, 4.0, N)], -1).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(gm, jnp.asarray(means),
                    jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
                    jnp.asarray(means[:, 2]), jnp.ones(N, bool), cam.fx, cam.fy)
    T_cw = jnp.eye(4)
    prep = jax.jit(lambda: preprocess(gm.means, gm.rgb, gm.quats,
                                      gm.logit_opacities, gm.log_scales,
                                      gm.active, T_cw, cam))()
    bins = jax.jit(lambda: bin_gaussians(prep, cam, rcfg))()
    jax.block_until_ready(bins.indices)
    M = int(jnp.sum(bins.counts))
    print(f"dilate={dilate} instances: {M}  tiles: {bins.indices.shape[0]} "
          f"cap: {bins.indices.shape[1]} chunk: {rcfg.chunk}")

    # --- per-gaussian preprocess ---
    def st_prep(c):
        p = preprocess(c, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
                       gm.active, T_cw, cam)
        return feed(c, p.mean2d)
    timeit_loop("preprocess (per-gaussian)", st_prep, gm.means)

    # --- binning ---
    def st_bin(c):
        b = bin_gaussians(
            preprocess(c, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
                       gm.active, T_cw, cam), cam, rcfg)
        return feed(c, b.counts.astype(jnp.float32))
    timeit_loop("preprocess+bin_gaussians", st_bin, gm.means, r=4)

    # --- pack gather (mapping per-iter) ---
    def st_pack(c):
        p = preprocess(c, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
                       gm.active, T_cw, cam)
        return feed(c, _pack_instances(p, bins))
    timeit_loop("preprocess+pack gather [T,12,cap]", st_pack, gm.means)

    # --- pack + scatter-add backward (mapping gather+scatter cost) ---
    def st_pack_grad(c):
        def f(m):
            p = preprocess(m, gm.rgb, gm.quats, gm.logit_opacities,
                           gm.log_scales, gm.active, T_cw, cam)
            return jnp.sum(_pack_instances(p, bins) ** 2)
        g = jax.grad(f)(c)
        return feed(c, g)
    timeit_loop("preprocess+pack fwd+bwd (scatter-add)", st_pack_grad, gm.means)

    # --- instance preprocess (tracking per-iter) ---
    raw = jax.jit(lambda: pack_raw_instances(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, bins))()
    def st_pi(c):
        return feed(c, preprocess_instances(raw, c, cam))
    timeit_loop("preprocess_instances fwd", st_pi, T_cw)

    def st_pi_grad(c):
        g = jax.grad(lambda t: jnp.sum(preprocess_instances(raw, t, cam) ** 2))(c)
        return feed(c, g)
    timeit_loop("preprocess_instances fwd+bwd (d/dT)", st_pi_grad, T_cw)

    # --- blend fwd ---
    packed = jax.jit(lambda: _pack_instances(prep, bins))()
    def st_blend(c):
        o = blend_and_untile(c, bins.counts, cam, rcfg)
        return feed(c, o.color)
    timeit_loop("pallas blend fwd", st_blend, packed)

    def st_blend_grad(c):
        def f(p):
            o = blend_and_untile(p, bins.counts, cam, rcfg)
            return jnp.sum(jnp.abs(o.color)) + jnp.sum(o.depth) + jnp.sum(o.alpha)
        return feed(c, jax.grad(f)(c))
    timeit_loop("pallas blend fwd+bwd", st_blend_grad, packed)

    rcfg16 = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=256,
                          dilate_px=dilate, exact_stop=False, blend_bf16=True)
    def st_blend16(c):
        def f(p):
            o = blend_and_untile(p, bins.counts, cam, rcfg16)
            return jnp.sum(jnp.abs(o.color)) + jnp.sum(o.depth) + jnp.sum(o.alpha)
        return feed(c, jax.grad(f)(c))
    timeit_loop("pallas blend fwd+bwd (blend_bf16)", st_blend16, packed)

    rcfg128 = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=128,
                           dilate_px=dilate, exact_stop=False)
    def st_blend128(c):
        def f(p):
            o = blend_and_untile(p, bins.counts, cam, rcfg128)
            return jnp.sum(jnp.abs(o.color)) + jnp.sum(o.depth) + jnp.sum(o.alpha)
        return feed(c, jax.grad(f)(c))
    timeit_loop("pallas blend fwd+bwd (chunk=128)", st_blend128, packed)

    # --- full tracking iteration ---
    def st_track(c):
        def f(t):
            scr = preprocess_instances(raw, t, cam)
            o = blend_and_untile(scr, bins.counts, cam, rcfg)
            return jnp.sum(jnp.abs(o.color)) + jnp.sum(jnp.abs(o.depth))
        return feed(c, jax.grad(f)(c))
    timeit_loop("tracking iter fwd+bwd (d/dT)", st_track, T_cw)

    # --- fused tracking kernel alone ---
    from gsorb_slam_tpu.raster.pallas_raster import tile_gt_images, tracking_loss_grad
    from gsorb_slam_tpu.raster.tiled import render_tiled
    out0 = jax.jit(lambda p: render_tiled(p, bins, cam, rcfg))(prep)
    gt_c = jax.lax.stop_gradient(out0.color)
    gt_d = jax.lax.stop_gradient(jnp.where(out0.alpha > 0.5, out0.median_depth, 0.0))
    gt4 = tile_gt_images(gt_c, gt_d, cam, rcfg)
    def st_fused(c):
        img, dep, g = tracking_loss_grad(c, bins.counts, gt4, cam, rcfg, 0.7, 1.0, True)
        return feed(c, g)
    timeit_loop("FUSED kernel (fwd+loss+bwd)", st_fused, packed)

    def st_fused_pose(c):
        from gsorb_slam_tpu.core.transforms import matrix_to_pose, pose_to_matrix
        def f(t4):
            screen, vjp = jax.vjp(lambda tt: preprocess_instances(raw, tt, cam), t4)
            img, dep, d_screen = tracking_loss_grad(screen, bins.counts, gt4, cam, rcfg, 0.7, 1.0, True)
            (gt_,) = vjp(d_screen)
            return img + dep + jnp.sum(gt_ * 0)
        l = f(c)
        return feed(c, l[None])
    timeit_loop("FUSED + preprocess vjp (full iter)", st_fused_pose, T_cw)

    # --- primitive candidates for the mapping backward ---
    Mpad = 1 << 20
    keys = jnp.asarray(np.sort(rng.integers(0, CAP, Mpad, dtype=np.int32)))
    ukeys = jnp.asarray(rng.integers(0, CAP, Mpad, dtype=np.int32))
    vals = jnp.asarray(rng.normal(size=(Mpad, 16)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(Mpad).astype(np.int32))

    def st_rowgather(c):
        return feed(c, c[perm])
    timeit_loop("row gather [1M,16] by perm", st_rowgather, vals)

    def st_segsum_sorted(c):
        return feed(c, jax.ops.segment_sum(c, keys, num_segments=CAP,
                                           indices_are_sorted=True))
    timeit_loop("segment_sum SORTED 1M -> 256k x16", st_segsum_sorted, vals)

    def st_segsum_uns(c):
        return feed(c, jax.ops.segment_sum(c, ukeys, num_segments=CAP,
                                           indices_are_sorted=False))
    timeit_loop("segment_sum UNSORTED 1M -> 256k x16", st_segsum_uns, vals)

    def st_scatter_add(c):
        out = jnp.zeros((CAP, 16), jnp.float32).at[ukeys].add(c)
        return feed(c, out)
    timeit_loop("scatter-add [1M,16] -> [256k,16]", st_scatter_add, vals)

    def st_sort(c):
        s, sv = jax.lax.sort([ukeys, c[:, 0]], num_keys=1)
        return feed(c, sv)
    timeit_loop("lax.sort 1M keys + 1 f32 payload", st_sort, vals)

    # --- MXU sanity ---
    a32 = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    def st_mm32(c):
        return feed(c, jnp.dot(c, c, preferred_element_type=jnp.float32))
    timeit_loop("matmul 4096^3 f32 (137 GFLOP)", st_mm32, a32)
    a16 = a32.astype(jnp.bfloat16)
    def st_mm16(c):
        return feed(c, jnp.dot(c, c, preferred_element_type=jnp.float32))
    timeit_loop("matmul 4096^3 bf16", st_mm16, a16)


if __name__ == "__main__":
    main()
