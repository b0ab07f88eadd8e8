"""Rect16x8 triage, stage 3: the fused kernel was proven CORRECT per-tile
(probe_rect_debug), so the 0.82-0.90 'divergence' must be in the XLA
REFERENCE value the probes/smoke compare against (l_ref 284.8 vs the
host-recomputed masked sum 29.51). Bisect the reference:

  1. host numpy masked-sum from materialized blend outputs  (truth)
  2. jit(parts): the same sums computed inside one jit
  3. jit(xla_loss)                     (the smoke/probe formula)
  4. jit(value_and_grad(xla_loss))[0]  (exactly what the probe ran)

Whichever step jumps to ~284.8 is the broken lowering/semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.ops.losses import l1_tracking
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.instances import blend_packed_xla
from gsorb_slam_tpu.raster.pallas_raster import _pack_instances
from gsorb_slam_tpu.raster.tiled import render_tiled
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map


def main():
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
    cfg = RasterConfig(tile=16, tile_h=8, tile_capacity=1024, max_dup=16,
                       chunk=256, chunk_unroll=2, fused_tiles_per_step=2,
                       dilate_px=8.0, exact_stop=False)
    prep = jax.jit(lambda: preprocess(gm.means, gm.rgb, gm.quats,
                                      gm.logit_opacities, gm.log_scales,
                                      gm.active, T, cam))()
    bins = jax.jit(lambda: bin_gaussians(prep, cam, cfg))()
    packed = jax.jit(lambda: _pack_instances(prep, bins))()
    ref = jax.jit(lambda p: render_tiled(p, bins, cam, cfg))(prep)
    gt_color = jax.lax.stop_gradient(ref.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(ref.alpha > 0.5, ref.median_depth, 0.0))

    # 1. host truth
    o = jax.jit(lambda p: blend_packed_xla(p, bins.counts, cam, cfg))(packed)
    a = np.asarray(o.alpha); d = np.asarray(o.depth); c = np.asarray(o.color)
    gc = np.asarray(gt_color); gd = np.asarray(gt_depth)
    m = ((a > 0.99) & (gd > 0)).astype(np.float32)
    host = 0.7 * float((np.abs(c - gc).sum(-1) * m).sum()) + float(
        (np.abs(d - gd) * m).sum())
    print(f"[1] host masked-sum: {host:.4f}  mask_px={int(m.sum())}",
          flush=True)

    # 2. same sums inside one jit
    def parts(p):
        o = blend_packed_xla(p, bins.counts, cam, cfg)
        mask = ((o.alpha > 0.99) & (gt_depth > 0)).astype(jnp.float32)
        col = jnp.sum(jnp.abs(o.color - gt_color).sum(-1) * mask)
        dep = jnp.sum(jnp.abs(o.depth - gt_depth) * mask)
        return (jnp.sum(mask), col, dep, jnp.sum(o.alpha), jnp.sum(o.depth))

    mp, col, dep, sa, sd = [float(x) for x in jax.jit(parts)(packed)]
    print(f"[2] jit parts: mask_px={mp:.0f} col={col:.4f} dep={dep:.4f} "
          f"total={0.7*col+dep:.4f} sum_alpha={sa:.2f} sum_depth={sd:.2f}",
          flush=True)
    print(f"    host sums: sum_alpha={a.sum():.2f} sum_depth={d.sum():.2f}",
          flush=True)

    # 3/4. the probe formula, value then value_and_grad
    def xla_loss(p):
        o = blend_packed_xla(p, bins.counts, cam, cfg)
        mask = jax.lax.stop_gradient((o.alpha > 0.99) & (gt_depth > 0))
        return 0.7 * l1_tracking(o.color, gt_color, mask) + l1_tracking(
            o.depth, gt_depth, mask)

    lv = float(jax.jit(xla_loss)(packed))
    print(f"[3] jit(xla_loss): {lv:.4f}", flush=True)
    lvg, _ = jax.jit(jax.value_and_grad(xla_loss))(packed)
    print(f"[4] jit(value_and_grad(xla_loss)): {float(lvg):.4f}", flush=True)


if __name__ == "__main__":
    main()
