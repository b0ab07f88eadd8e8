"""Production mapping-step budget at the bench workload (VERDICT r5 item 2).

Times the EXACT map_window iteration (flat-chunk Pallas blend, reference
loss mix, masked Adam) and its components, at the bench.py mapping shape
(VGA, 250k splats, production RasterConfig). Each variant disables one
piece so the deltas attribute the budget:

    full          the production step (matches bench mapping_iters_per_sec)
    no_ssim       lam=1.0 (L1-only image loss) -> SSIM conv cost
    fwd_only      loss value without value_and_grad -> backward cost
    no_blend      loss on a linear stand-in of the packed rows -> kernel cost
    no_adam       grads computed, adam_step skipped -> optimizer cost
    pack_only     gather + scatter-back of the flat pack -> gather cost

Usage: python scripts/profile_map_full.py [iters]
Env: GSORB_MAP_K / GSORB_MAP_GROUP override chunk / flat_group.
"""

import dataclasses
import functools
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import MappingConfig
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.slam.mapping import WindowFrames, map_window
from gsorb_slam_tpu.slam.system import System
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map


def bench_once(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    W, H, N, CAP = 640, 480, 250_000, 1 << 18
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    rcfg = System.default_raster_config(W)
    k = int(os.environ.get("GSORB_MAP_K", "0"))
    if k:
        rcfg = dataclasses.replace(rcfg, chunk=k)
    g = int(os.environ.get("GSORB_MAP_GROUP", "0"))
    if g:
        rcfg = dataclasses.replace(rcfg, flat_group=g)
    mcfg = MappingConfig(num_iters=iters, max_gaussians=CAP)

    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(0.8, 4.0, N)], -1).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(gm, jnp.asarray(means),
                    jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
                    jnp.asarray(means[:, 2]), jnp.ones(N, bool),
                    cam.fx, cam.fy)
    T = jnp.eye(4)
    prep = jax.jit(lambda: preprocess(gm.means, gm.rgb, gm.quats,
                                      gm.logit_opacities, gm.log_scales,
                                      gm.active, T, cam))()
    bins = jax.jit(lambda: bin_gaussians(prep, cam, rcfg))()
    n_inst = int(jnp.sum(bins.counts))
    live_chunks = int(jnp.sum(-(-bins.counts // rcfg.chunk)))
    budget = 1 << (live_chunks - 1).bit_length()
    print(f"instances {n_inst} live_chunks {live_chunks} budget {budget} "
          f"K={rcfg.chunk} group={rcfg.flat_group} "
          f"blend_bf16={rcfg.blend_bf16} elem16={rcfg.elem_bf16}", flush=True)

    # one-frame window at the GT pose (the render itself is the workload)
    from gsorb_slam_tpu.raster.tiled import render_tiled

    ref = jax.jit(lambda: render_tiled(prep, bins, cam, rcfg))()
    gt_color = jax.lax.stop_gradient(ref.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(ref.alpha > 0.5, ref.median_depth, 0.0))
    Wn = 1
    frames = WindowFrames(
        colors=gt_color[None], depths=gt_depth[None], poses=T[None],
        bins_indices=bins.indices[None], bins_counts=bins.counts[None],
        n_frames=jnp.asarray(1, jnp.int32),
    )

    run = jax.jit(functools.partial(
        map_window, cam=cam, mcfg=mcfg, rcfg=rcfg, num_iters=iters,
        init_mode=False, chunk_budget=budget,
    ))
    key = jax.random.PRNGKey(0)
    t_full = bench_once("full", lambda: run(gm, frames, key)[0].means)
    print(f"full map_window: {t_full*1e3/iters:8.2f} ms/iter "
          f"({iters/t_full:.1f} it/s)", flush=True)

    # --- variants ---
    mc_nossim = dataclasses.replace(mcfg, lam=1.0)
    run_nossim = jax.jit(functools.partial(
        map_window, cam=cam, mcfg=mc_nossim, rcfg=rcfg, num_iters=iters,
        init_mode=False, chunk_budget=budget,
    ))
    t = bench_once("no_ssim", lambda: run_nossim(gm, frames, key)[0].means)
    print(f"no_ssim (lam=1): {t*1e3/iters:8.2f} ms/iter  "
          f"(ssim cost ~{(t_full-t)*1e3/iters:.2f})", flush=True)

    # fwd-only: same loss, no grad
    from gsorb_slam_tpu.raster.binning import chunk_layout, tile_grid_shape
    from gsorb_slam_tpu.raster.pallas_raster import render_pallas_flat
    from gsorb_slam_tpu.slam.mapping import _mapping_loss

    ty, tx = tile_grid_shape(cam, rcfg)
    cbins = chunk_layout(bins, ty * tx, rcfg.chunk, budget)

    # Every variant below threads the loop carry into the inputs (acc *
    # 1e-20 perturbation) so XLA cannot hoist the loop-invariant body —
    # without it the fori measures ONE evaluation plus adds (the r5
    # first-cut numbers were exactly that artifact).
    def loss_at(gm_, aux=None):
        prep_ = preprocess(gm_.means, gm_.rgb, gm_.quats,
                           gm_.logit_opacities, gm_.log_scales, gm_.active,
                           T, cam, mcfg.scale_modifier)
        out = render_pallas_flat(prep_, cbins, cam, rcfg, pack_aux=aux)
        return _mapping_loss(gm_, out, gt_color, gt_depth, mcfg, False)

    def fwd_many(gm_):
        def body(i, acc):
            g2 = dataclasses.replace(gm_, means=gm_.means + acc * 1e-20)
            return acc + loss_at(g2)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    t = bench_once("fwd_only", jax.jit(fwd_many), gm)
    print(f"fwd_only loss:   {t*1e3/iters:8.2f} ms/iter  "
          f"(backward ~{(t_full-t)*1e3/iters:.2f} incl adam)", flush=True)

    from gsorb_slam_tpu.raster.pallas_raster import flat_pack_grad_aux

    def mk_grad_many(aux):
        def grad_many(gm_):
            def body(i, acc):
                g2 = dataclasses.replace(gm_, means=gm_.means + acc * 1e-20)
                g = jax.grad(lambda p: loss_at(
                    dataclasses.replace(g2, **p), aux))(g2.params())
                return acc + jnp.sum(g["means"][:1])
            return jax.lax.fori_loop(0, iters, body, 0.0)
        return grad_many

    t = bench_once("grad_no_adam", jax.jit(mk_grad_many(None)), gm)
    print(f"grad_no_adam:    {t*1e3/iters:8.2f} ms/iter  "
          f"(adam+scan ~{(t_full-t)*1e3/iters:.2f})", flush=True)

    aux = jax.jit(lambda: flat_pack_grad_aux(cbins.indices, CAP))()
    t = bench_once("grad_sorted", jax.jit(mk_grad_many(aux)), gm)
    print(f"grad sorted-seg: {t*1e3/iters:8.2f} ms/iter  "
          f"(sorted_pack_grad A/B)", flush=True)

    # adam_step alone over capacity (fixed grads, carry-perturbed)
    from gsorb_slam_tpu.splat.gaussians import adam_step, map_learning_rates

    lrs = map_learning_rates(mcfg)
    g_fixed = jax.jit(jax.grad(lambda p: loss_at(
        dataclasses.replace(gm, **p))))(gm.params())

    def adam_many(gm_):
        def body(i, gma):
            g2 = adam_step(gma, g_fixed, lrs)
            return g2
        return jax.lax.fori_loop(0, iters, body, gm_).means

    t = bench_once("adam_only", jax.jit(adam_many), gm)
    print(f"adam_only:       {t*1e3/iters:8.2f} ms/iter", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
