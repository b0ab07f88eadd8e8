"""TPU accuracy smoke gate: COMPILED (Mosaic) kernels vs the XLA blends.

The CPU suite runs Pallas in interpret mode only, and interpret-on-TPU
shares XLA:TPU's default-precision matmuls — so a whole class of bug
(Mosaic lowering, MXU input-precision rounding) only shows up when the
compiled kernel is compared against the precision=HIGHEST XLA path ON the
TPU. This script is that comparison; run it after any kernel change
(r2 regression caught here: default-precision MXU inputs put O(1) error
into ln(alpha) via catastrophic cancellation -> 0.65 color divergence).

Exit code 0 = all gates pass.
"""

import sys

import numpy as np
import jax

# The XLA reference paths must themselves run at full f32 — TPU's default
# matmul precision rounds inputs to bf16, which corrupts the autodiff
# reference far more than the kernels being tested.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: remote (axon) compiles cost minutes; without
# this every gate run re-pays them all.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.ops.losses import l1_tracking
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.instances import (
    blend_packed_xla,
    pack_raw_instances,
    preprocess_instances,
)
from gsorb_slam_tpu.raster.pallas_raster import (
    _pack_instances,
    blend_and_untile,
    tile_gt_images,
    tracking_loss_grad,
)
from gsorb_slam_tpu.raster.tiled import render_tiled
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map


def main() -> int:
    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend attached")
        return 0

    cam = Camera(fx=90.0, fy=90.0, cx=48.0, cy=36.0, width=96, height=72)
    rng = np.random.default_rng(1)
    N, CAP = 3000, 1 << 13
    means = np.stack(
        [rng.uniform(-1, 1, N), rng.uniform(-0.8, 0.8, N), rng.uniform(1.0, 3.0, N)],
        -1,
    ).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(
        gm, jnp.asarray(means),
        jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
        jnp.asarray(means[:, 2]), jnp.ones(N, bool), cam.fx, cam.fy,
    )
    T = jnp.eye(4)
    ok = True

    for exact in (False, True):
        # The non-exact pass mirrors the PRODUCTION kernel shape (chunk 256,
        # B=2/U=2 — r4c sweep best); exact keeps the historical 128 so both
        # chunk generations stay gated.
        rcfg = RasterConfig(
            tile=16, tile_capacity=1024, max_dup=16,
            chunk=128 if exact else 256,
            chunk_unroll=4 if exact else 2,
            fused_tiles_per_step=4 if exact else 2,
            dilate_px=8.0, exact_stop=exact,
        )
        prep = jax.jit(
            lambda: preprocess(gm.means, gm.rgb, gm.quats, gm.logit_opacities,
                               gm.log_scales, gm.active, T, cam)
        )()
        bins = jax.jit(lambda: bin_gaussians(prep, cam, rcfg))()
        packed = jax.jit(lambda: _pack_instances(prep, bins))()
        ox = jax.jit(lambda p: blend_packed_xla(p, bins.counts, cam, rcfg))(packed)
        oc = jax.jit(
            lambda p: blend_and_untile(p, bins.counts, cam, rcfg, interpret=False)
        )(packed)
        for name, tol in (("color", 2e-3), ("depth", 5e-3), ("alpha", 2e-3),
                          ("final_t", 2e-3)):
            d = float(jnp.max(jnp.abs(getattr(oc, name) - getattr(ox, name))))
            status = "ok " if d < tol else "FAIL"
            if d >= tol:
                ok = False
            print(f"[{status}] exact={int(exact)} compiled-vs-xla {name}: {d:.6f} "
                  f"(tol {tol})", flush=True)

        # fused tracking kernel: loss + grads vs XLA autodiff, compiled
        ref = jax.jit(lambda p: render_tiled(p, bins, cam, rcfg))(prep)
        gt_color = jax.lax.stop_gradient(ref.color)
        gt_depth = jax.lax.stop_gradient(
            jnp.where(ref.alpha > 0.5, ref.median_depth, 0.0)
        )
        gt4 = tile_gt_images(gt_color, gt_depth, cam, rcfg)

        def xla_loss(p):
            o = blend_packed_xla(p, bins.counts, cam, rcfg)
            mask = jax.lax.stop_gradient((o.alpha > 0.99) & (gt_depth > 0))
            return 0.7 * l1_tracking(o.color, gt_color, mask) + 1.0 * (
                l1_tracking(o.depth, gt_depth, mask)
            )

        l_ref, _ = jax.jit(jax.value_and_grad(xla_loss))(packed)
        img, dep, _ = jax.jit(
            lambda p: tracking_loss_grad(
                p, bins.counts, gt4, cam, rcfg, 0.7, 1.0, False, interpret=False
            )
        )(packed)
        dl = abs(float(img + dep) - float(l_ref)) / max(abs(float(l_ref)), 1.0)
        s1 = "ok " if dl < 1e-3 else "FAIL"
        if dl >= 1e-3:
            ok = False
        print(f"[{s1}] exact={int(exact)} fused loss rel-err: {dl:.2e}", flush=True)

        # POSE-level gradient: the actual consumer of the fused kernel. The
        # per-instance grads legitimately differ from XLA autodiff at
        # mask-boundary pixels (the alpha>0.99 threshold flips under 1e-4
        # forward noise), but those flips are measure-zero in the pose sum.
        from gsorb_slam_tpu.core.transforms import matrix_to_pose, pose_to_matrix

        raw = jax.jit(
            lambda: pack_raw_instances(
                gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
                gm.active, bins,
            )
        )()
        q0, t0 = matrix_to_pose(jnp.eye(4).at[:3, 3].set(
            jnp.array([0.004, -0.003, 0.002])
        ))

        def xla_pose_loss(q, t):
            screen = preprocess_instances(raw, pose_to_matrix(q, t), cam)
            o = blend_packed_xla(screen, bins.counts, cam, rcfg)
            mask = jax.lax.stop_gradient((o.alpha > 0.99) & (gt_depth > 0))
            return 0.7 * l1_tracking(o.color, gt_color, mask) + 1.0 * (
                l1_tracking(o.depth, gt_depth, mask)
            )

        gq_ref, gt_ref = jax.jit(jax.grad(xla_pose_loss, argnums=(0, 1)))(q0, t0)

        def fused_pose_grad(q, t):
            screen, vjp = jax.vjp(
                lambda q_, t_: preprocess_instances(
                    raw, pose_to_matrix(q_, t_), cam
                ),
                q, t,
            )
            _i, _d, d_screen = tracking_loss_grad(
                screen, bins.counts, gt4, cam, rcfg, 0.7, 1.0, False,
                interpret=False,
            )
            return vjp(d_screen)

        gq_f, gt_f = jax.jit(fused_pose_grad)(q0, t0)
        rq = float(jnp.max(jnp.abs(gq_f - gq_ref)) / (jnp.max(jnp.abs(gq_ref)) + 1e-9))
        rt = float(jnp.max(jnp.abs(gt_f - gt_ref)) / (jnp.max(jnp.abs(gt_ref)) + 1e-9))
        s2 = "ok " if max(rq, rt) < 2e-2 else "FAIL"
        if max(rq, rt) >= 2e-2:
            ok = False
        print(f"[{s2}] exact={int(exact)} fused POSE grad rel-err: quat {rq:.2e} "
              f"trans {rt:.2e}", flush=True)

        if not exact:
            # Paired-rect kernel, compiled (the production rect-tile path;
            # the NON-paired px=128 rect fused path miscompiles under
            # Mosaic and now raises in track_frame rather than run): fused
            # loss vs a MATERIALIZED rect-XLA blend (host sums — computing
            # the masked loss in the SAME jit as blend_packed_xla at rect
            # shapes hits an XLA:TPU untile mis-lowering, bisected by
            # scripts/probe_rect_xla.py + probe_rect_debug.py).
            import dataclasses as _dc

            from gsorb_slam_tpu.raster.paired import (
                count_sorted_pair_permutation,
                pack_gt_pairs,
                tracking_loss_grad_paired,
            )

            rcfg_r = _dc.replace(rcfg, tile_h=8, paired=True)
            bins_r = jax.jit(lambda: bin_gaussians(prep, cam, rcfg_r))()
            packed_r = jax.jit(lambda: _pack_instances(prep, bins_r))()

            o_r = jax.jit(
                lambda p: blend_packed_xla(p, bins_r.counts, cam, rcfg_r)
            )(packed_r)
            import numpy as _np

            a_h = _np.asarray(o_r.alpha)
            c_h = _np.asarray(o_r.color)
            d_h = _np.asarray(o_r.depth)
            gc_h = _np.asarray(gt_color)
            gd_h = _np.asarray(gt_depth)
            m_h = ((a_h > 0.99) & (gd_h > 0)).astype(_np.float32)
            lr_ref = 0.7 * float(
                (_np.abs(c_h - gc_h).sum(-1) * m_h).sum()
            ) + float((_np.abs(d_h - gd_h) * m_h).sum())
            perm_r = count_sorted_pair_permutation(bins_r.counts)
            gt4_r = pack_gt_pairs(gt_color, gt_depth, cam, rcfg_r, perm=perm_r)
            img_r, dep_r, _ = jax.jit(
                lambda p, c, g, pm: tracking_loss_grad_paired(
                    p, c, g, cam, rcfg_r, 0.7, 1.0, False,
                    interpret=False, tile_ids=pm,
                )
            )(packed_r[perm_r], bins_r.counts[perm_r], gt4_r, perm_r)
            dlr = abs(float(img_r + dep_r) - lr_ref) / max(abs(lr_ref), 1.0)
            sr = "ok " if dlr < 2e-2 else "FAIL"
            if dlr >= 2e-2:
                ok = False
            print(f"[{sr}] exact={int(exact)} paired-rect fused loss rel-err: "
                  f"{dlr:.2e} (materialized-blend reference)", flush=True)

        if not exact:
            # preprocess-pallas pair (raster/preprocess_pallas.py): compiled
            # fwd + pose cotangent vs the XLA preprocess chain feeding the
            # SAME fused kernel — isolates the new kernel pair exactly.
            from gsorb_slam_tpu.raster.preprocess_pallas import (
                preprocess_instances_pallas,
                rt_from_matrix,
            )

            def pp_pose_grad(q, t):
                screen, vjp = jax.vjp(
                    lambda q_, t_: preprocess_instances_pallas(
                        raw, rt_from_matrix(pose_to_matrix(q_, t_)), cam,
                        1.0, 8, False,
                    ),
                    q, t,
                )
                _i, _d, d_screen = tracking_loss_grad(
                    screen, bins.counts, gt4, cam, rcfg, 0.7, 1.0, False,
                    interpret=False,
                )
                return vjp(d_screen)

            gq_p, gt_p = jax.jit(pp_pose_grad)(q0, t0)
            rqp = float(
                jnp.max(jnp.abs(gq_p - gq_f)) / (jnp.max(jnp.abs(gq_f)) + 1e-9)
            )
            rtp = float(
                jnp.max(jnp.abs(gt_p - gt_f)) / (jnp.max(jnp.abs(gt_f)) + 1e-9)
            )
            sp = "ok " if max(rqp, rtp) < 1e-3 else "FAIL"
            if max(rqp, rtp) >= 1e-3:
                ok = False
            print(f"[{sp}] exact={int(exact)} preprocess-pallas POSE grad "
                  f"rel-err: quat {rqp:.2e} trans {rtp:.2e}", flush=True)

            # blend_bf16 fast mode: the cumsum/suffix matmuls run in bf16
            # (operands are O(1) log-transmittances — bounded relative
            # error, no cancellation). Gate its POSE gradients against the
            # same f32 XLA reference before it can be a production default.
            import dataclasses as _dc

            rcfg_bf = _dc.replace(rcfg, blend_bf16=True)

            def fused_pose_grad_bf(q, t):
                screen, vjp = jax.vjp(
                    lambda q_, t_: preprocess_instances(
                        raw, pose_to_matrix(q_, t_), cam
                    ),
                    q, t,
                )
                _i, _d, d_screen = tracking_loss_grad(
                    screen, bins.counts, gt4, cam, rcfg_bf, 0.7, 1.0, False,
                    interpret=False,
                )
                return vjp(d_screen)

            gq_b, gt_b = jax.jit(fused_pose_grad_bf)(q0, t0)
            rqb = float(
                jnp.max(jnp.abs(gq_b - gq_ref)) / (jnp.max(jnp.abs(gq_ref)) + 1e-9)
            )
            rtb = float(
                jnp.max(jnp.abs(gt_b - gt_ref)) / (jnp.max(jnp.abs(gt_ref)) + 1e-9)
            )
            sb = "ok " if max(rqb, rtb) < 5e-2 else "FAIL"
            if max(rqb, rtb) >= 5e-2:
                ok = False
            print(f"[{sb}] exact={int(exact)} bf16-blend POSE grad rel-err: "
                  f"quat {rqb:.2e} trans {rtb:.2e}", flush=True)

            # elem_bf16 fast mode: the whole [K, px] elementwise slab chain
            # in packed bf16 (ln-alpha stays the f32 MXU output). Per-element
            # weights carry ~0.4% relative error; the gate checks the SUMMED
            # pose gradient stays directionally tight — this mode exists for
            # the VPU-pass-bound fast path and is only a candidate default
            # if the ablation shows packed-bf16 VPU throughput gains.
            rcfg_e16 = _dc.replace(rcfg, elem_bf16=True)

            def fused_pose_grad_e16(q, t):
                screen, vjp = jax.vjp(
                    lambda q_, t_: preprocess_instances(
                        raw, pose_to_matrix(q_, t_), cam
                    ),
                    q, t,
                )
                _i, _d, d_screen = tracking_loss_grad(
                    screen, bins.counts, gt4, cam, rcfg_e16, 0.7, 1.0, False,
                    interpret=False,
                )
                return vjp(d_screen)

            gq_e, gt_e = jax.jit(fused_pose_grad_e16)(q0, t0)
            rqe = float(
                jnp.max(jnp.abs(gq_e - gq_ref)) / (jnp.max(jnp.abs(gq_ref)) + 1e-9)
            )
            rte = float(
                jnp.max(jnp.abs(gt_e - gt_ref)) / (jnp.max(jnp.abs(gt_ref)) + 1e-9)
            )
            se = "ok " if max(rqe, rte) < 8e-2 else "FAIL"
            if max(rqe, rte) >= 8e-2:
                ok = False
            print(f"[{se}] exact={int(exact)} elem-bf16 POSE grad rel-err: "
                  f"quat {rqe:.2e} trans {rte:.2e}", flush=True)

        # strided tile_ids (the mesh tracking layout), compiled: shard rows
        # must reproduce the identity run row-for-row and shard losses must
        # sum to the full loss — guards the scalar-prefetch indexing at the
        # Mosaic level (the CPU suite only checks it in interpret mode).
        img_f, dep_f, g_full = jax.jit(
            lambda p: tracking_loss_grad(
                p, bins.counts, gt4, cam, rcfg, 0.7, 1.0, False,
                interpret=False,
            )
        )(packed)
        n_rows = packed.shape[0]
        shard_sum = 0.0
        shard_ok = True
        for s in range(2):
            ids = jnp.arange(s, n_rows, 2, dtype=jnp.int32)
            img_s, dep_s, g_s = jax.jit(
                lambda p, c, g, i: tracking_loss_grad(
                    p, c, g, cam, rcfg, 0.7, 1.0, False, interpret=False,
                    tile_ids=i,
                )
            )(packed[ids], bins.counts[ids], gt4[ids], ids)
            shard_sum += float(img_s + dep_s)
            dg = float(jnp.max(jnp.abs(g_s - g_full[ids])))
            if dg > 1e-4:
                shard_ok = False
            print(f"[{'ok ' if dg <= 1e-4 else 'FAIL'}] exact={int(exact)} "
                  f"tile_ids shard {s} grad max-abs-diff: {dg:.2e}", flush=True)
        dsum = abs(shard_sum - float(img_f + dep_f)) / max(
            abs(float(img_f + dep_f)), 1.0
        )
        if dsum > 1e-4:
            shard_ok = False
        print(f"[{'ok ' if dsum <= 1e-4 else 'FAIL'}] exact={int(exact)} "
              f"tile_ids shard loss-sum rel-err: {dsum:.2e}", flush=True)
        ok = ok and shard_ok

        # flat-chunk mapping path, compiled
        from gsorb_slam_tpu.raster.binning import chunk_layout, tile_grid_shape
        from gsorb_slam_tpu.raster.pallas_raster import render_pallas_flat

        ty, tx = tile_grid_shape(cam, rcfg)
        cb = jax.jit(
            lambda: chunk_layout(bins, ty * tx, rcfg.chunk, 1024)
        )()
        of = jax.jit(
            lambda: render_pallas_flat(prep, cb, cam, rcfg, interpret=False)
        )()
        dfl = float(jnp.max(jnp.abs(of.color - ox.color)))
        s3 = "ok " if dfl < 2e-3 else "FAIL"
        if dfl >= 2e-3:
            ok = False
        print(f"[{s3}] exact={int(exact)} flat-vs-xla color: {dfl:.6f}", flush=True)

        # gt*0.9 keeps pred != gt everywhere: at pred == gt the L1 sign is
        # 1e-5-noise-determined and per-parameter grads legitimately differ.
        gt9 = gt_color * 0.9

        def flat_loss(m):
            import dataclasses as dc

            p2 = dc.replace(prep, mean2d=prep.mean2d + m)
            o = render_pallas_flat(p2, cb, cam, rcfg, interpret=False)
            return jnp.sum(jnp.abs(o.color - gt9)) + jnp.sum(o.depth)

        def xla_loss2(m):
            import dataclasses as dc

            from gsorb_slam_tpu.raster.tiled import render_tiled as rt

            p2 = dc.replace(prep, mean2d=prep.mean2d + m)
            o = rt(p2, bins, cam, rcfg)
            return jnp.sum(jnp.abs(o.color - gt9)) + jnp.sum(o.depth)

        zz = jnp.zeros_like(prep.mean2d)
        gf = jax.jit(jax.grad(flat_loss))(zz)
        gx = jax.jit(jax.grad(xla_loss2))(zz)
        rg = float(jnp.max(jnp.abs(gf - gx)) / (jnp.max(jnp.abs(gx)) + 1e-9))
        s4 = "ok " if rg < 2e-2 else "FAIL"
        if rg >= 2e-2:
            ok = False
        print(f"[{s4}] exact={int(exact)} flat param-grad rel-err: {rg:.2e}",
              flush=True)

    print("TPU-SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
