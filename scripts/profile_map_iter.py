"""Breakdown of the mapping iteration: preprocess / pack / blend / scatter."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.pallas_raster import _pack_instances, blend_and_untile
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
    eps = sum(jnp.sum(l[:1].astype(jnp.float32)) * 1e-38 for l in leaves)
    return jax.tree.map(
        lambda a: a + eps.astype(a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        carry,
    )


def main():
    W, H, N, CAP = 640, 480, 250_000, 1 << 18
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    rcfg = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=256,
                        dilate_px=4.0, exact_stop=False)
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
    print(f"instances: {int(jnp.sum(bins.counts))}")

    def run_prep(m):
        return preprocess(m, gm.rgb, gm.quats, gm.logit_opacities,
                          gm.log_scales, gm.active, T_cw, cam)

    def st_prep(c):
        return feed(c, run_prep(c))
    timeit_loop("preprocess (per-gaussian) fwd", st_prep, gm.means)

    def st_prep_bwd(c):
        g = jax.grad(lambda m: jnp.sum(run_prep(m).mean2d)
                     + jnp.sum(run_prep(m).conic))(c)
        return feed(c, g)
    timeit_loop("preprocess (per-gaussian) fwd+bwd", st_prep_bwd, gm.means)

    def st_pack(c):
        p = jax.tree.map(lambda a: a, prep)
        p.mean2d = p.mean2d + c[:, :2] * 1e-38
        return feed(c, _pack_instances(p, bins))
    timeit_loop("pack only (from fixed prep)", st_pack, gm.means)

    def st_pack_bwd(c):
        def f(m):
            import dataclasses
            p = dataclasses.replace(prep, mean2d=prep.mean2d + m[:, :2])
            return jnp.sum(_pack_instances(p, bins) ** 2)
        return feed(c, jax.grad(f)(jnp.zeros_like(c)))
    timeit_loop("pack fwd+bwd only (scatter)", st_pack_bwd, gm.means)

    # full mapping raster iteration: preprocess -> pack -> blend -> grads
    def st_full(c):
        def f(m):
            p = preprocess(m, gm.rgb, gm.quats, gm.logit_opacities,
                           gm.log_scales, gm.active, T_cw, cam)
            packed = _pack_instances(p, bins)
            o = blend_and_untile(packed, bins.counts, cam, rcfg)
            return jnp.sum(jnp.abs(o.color)) + jnp.sum(o.depth) + jnp.sum(o.alpha)
        return feed(c, jax.grad(f)(c))
    timeit_loop("FULL mapping raster iter (d/dmeans)", st_full, gm.means)


if __name__ == "__main__":
    main()
