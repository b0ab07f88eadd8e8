"""Pallas blend kernels vs the XLA tiled renderer (interpret mode on CPU).

The same pair is cross-checked compiled on real TPU by the verify drive;
here interpret mode pins the math. The XLA renderer is itself validated
against the dense oracle in test_raster.py, closing the chain
oracle == XLA == Pallas for outputs and gradients.
"""

# Tolerances: the Pallas kernels carry transmittance in log space and
# evaluate the Gaussian falloff through a polynomial pixel basis (MXU
# matmuls), so outputs differ from the direct-product XLA blend by ~1e-5
# f32 accumulation noise.
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess, render_tiled
from gsorb_slam_tpu.raster.pallas_raster import render_pallas

from tests.scenes import identity_pose, random_cloud_scene, tiny_camera

CFG = RasterConfig(tile=16, tile_capacity=512, max_dup=16, chunk=128)


def _prep(scene, cam, pose=None):
    return preprocess(
        scene["means"], scene["rgb"], scene["quats"], scene["logit_opacities"],
        scene["log_scales"], scene["active"],
        pose if pose is not None else identity_pose(), cam,
    )


def test_pallas_forward_matches_tiled(rng):
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, CFG)
    ref = render_tiled(prep, bins, cam, CFG)
    out = render_pallas(prep, bins, cam, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.final_t), np.asarray(ref.final_t), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.median_depth), np.asarray(ref.median_depth), atol=1e-4
    )


def test_pallas_forward_opaque_early_exit_path(rng):
    """Nearly-opaque splats drive the early-exit branch; outputs must still
    match the XLA blend exactly."""
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=350, capacity=384)
    scene["logit_opacities"] = jnp.full_like(scene["logit_opacities"], 8.0)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, CFG)
    ref = render_tiled(prep, bins, cam, CFG)
    out = render_pallas(prep, bins, cam, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.final_t), np.asarray(ref.final_t), atol=5e-5
    )


def test_pallas_gradients_match_tiled(rng):
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=200, capacity=256)
    prep0 = _prep(scene, cam)
    bins = bin_gaussians(prep0, cam, CFG)
    target = jnp.asarray(rng.uniform(size=(48, 64, 3)).astype(np.float32))
    tdep = jnp.asarray(rng.uniform(1, 3, size=(48, 64)).astype(np.float32))

    def make_loss(render_fn):
        def loss(flds):
            p = dataclasses.replace(prep0, **flds)
            out = render_fn(p)
            return (
                jnp.mean(jnp.abs(out.color - target))
                + 0.3 * jnp.mean(jnp.abs(out.depth - tdep))
                + 0.1 * jnp.mean(out.alpha)
                + 0.05 * jnp.mean(out.final_t**2)
            )
        return loss

    flds = dict(
        mean2d=prep0.mean2d, conic=prep0.conic, opacity=prep0.opacity,
        color=prep0.color, depth=prep0.depth,
    )
    g_ref = jax.grad(make_loss(lambda p: render_tiled(p, bins, cam, CFG)))(flds)
    g_pal = jax.grad(
        make_loss(lambda p: render_pallas(p, bins, cam, CFG, interpret=True))
    )(flds)
    for k in flds:
        a = np.asarray(g_ref[k])
        b = np.asarray(g_pal[k])
        m = np.isfinite(a) & np.isfinite(b)
        scale = max(np.abs(a[m]).max(), 1e-8)
        np.testing.assert_allclose(
            np.where(m, a, 0), np.where(m, b, 0), atol=2e-5 * max(scale, 1.0), rtol=1e-3
        )


def test_pallas_empty_map(rng):
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=4, capacity=8)
    scene["active"] = jnp.zeros(8, bool)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, CFG)
    out = render_pallas(prep, bins, cam, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out.color), 0.0)
    np.testing.assert_allclose(np.asarray(out.final_t), 1.0)


def test_pallas_median_depth_no_gradient(rng):
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=50, capacity=64)
    prep0 = _prep(scene, cam)
    bins = bin_gaussians(prep0, cam, CFG)

    def loss(op):
        p = dataclasses.replace(prep0, opacity=op)
        return jnp.sum(render_pallas(p, bins, cam, CFG, interpret=True).median_depth)

    g = jax.grad(loss)(prep0.opacity)
    np.testing.assert_allclose(np.asarray(g), 0.0)


@pytest.mark.parametrize("exact", [True, False])
def test_fused_tracking_matches_xla_autodiff(rng, exact):
    """The fused tracking kernel (fwd + masked-L1 loss + cotangents + bwd in
    one launch) must reproduce XLA autodiff through the portable blend.

    exact=False covers the lean fast path (multi-tile grid blocks, crossing
    median, no per-element STOP_T gating) at relaxed tolerances: past-stop
    contributions are bounded by the 1e-4 exit transmittance."""
    from gsorb_slam_tpu.ops.losses import l1_tracking
    from gsorb_slam_tpu.raster.instances import blend_packed_xla
    from gsorb_slam_tpu.raster.pallas_raster import (
        _pack_instances,
        tile_gt_images,
        tracking_loss_grad,
    )

    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                       exact_stop=exact, fused_tiles_per_step=4)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    packed = _pack_instances(prep, bins)

    # a slightly different scene as "gt" so signs/masks are non-trivial
    scene2 = random_cloud_scene(rng, n=300, capacity=384)
    prep2 = _prep(scene2, cam)
    bins2 = bin_gaussians(prep2, cam, cfg)
    ref2 = render_tiled(prep2, bins2, cam, cfg)
    gt_color = jax.lax.stop_gradient(ref2.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(ref2.alpha > 0.3, ref2.median_depth, 0.0)
    )

    im_w, depth_w = 0.7, 1.0
    for use_sur in (True, False):
        def loss_fn(p):
            out = blend_packed_xla(p, bins.counts, cam, cfg)
            mask = jax.lax.stop_gradient((out.alpha > 0.99) & (gt_depth > 0))
            image_l1 = l1_tracking(out.color, gt_color, mask)
            dpred = out.median_depth if use_sur else out.depth
            return im_w * image_l1 + depth_w * l1_tracking(dpred, gt_depth, mask)

        loss_ref, g_ref = jax.value_and_grad(loss_fn)(packed)

        gt4 = tile_gt_images(gt_color, gt_depth, cam, cfg)
        img_l1, dep_l1, grads = tracking_loss_grad(
            packed, bins.counts, gt4, cam, cfg, im_w, depth_w, use_sur,
            interpret=True,
        )
        loss_fused = img_l1 + dep_l1
        np.testing.assert_allclose(
            float(loss_fused), float(loss_ref),
            rtol=2e-5 if exact else 2e-3,
            err_msg=f"use_sur={use_sur}",
        )
        np.testing.assert_allclose(
            np.asarray(grads[:, :10, :]), np.asarray(g_ref[:, :10, :]),
            atol=2e-4 if exact else 8e-4, rtol=2e-3,
            err_msg=f"use_sur={use_sur}",
        )


@pytest.mark.parametrize("exact", [True, False])
def test_fused_tracking_pose_gradient_e2e(rng, exact):
    """Pose gradient through preprocess_instances + fused kernel equals the
    full-XLA autodiff pose gradient (the production tracking iteration)."""
    from gsorb_slam_tpu.core.transforms import matrix_to_pose, pose_to_matrix
    from gsorb_slam_tpu.ops.losses import l1_tracking
    from gsorb_slam_tpu.raster.instances import (
        blend_packed_xla,
        pack_raw_instances,
        preprocess_instances,
    )
    from gsorb_slam_tpu.raster.pallas_raster import (
        tile_gt_images,
        tracking_loss_grad,
    )

    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                       exact_stop=exact, fused_tiles_per_step=4)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=250, capacity=256)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    raw = pack_raw_instances(
        scene["means"], scene["rgb"], scene["quats"],
        scene["logit_opacities"], scene["log_scales"], scene["active"], bins,
    )
    ref = render_tiled(prep, bins, cam, cfg)
    gt_color = jax.lax.stop_gradient(ref.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(ref.alpha > 0.3, ref.median_depth, 0.0)
    )
    T0 = jnp.eye(4).at[:3, 3].set(jnp.array([0.01, -0.02, 0.005]))
    quat0, trans0 = matrix_to_pose(T0)
    im_w, depth_w, use_sur = 0.7, 1.0, False

    def xla_loss(q, t):
        screen = preprocess_instances(raw, pose_to_matrix(q, t), cam)
        out = blend_packed_xla(screen, bins.counts, cam, cfg)
        mask = jax.lax.stop_gradient((out.alpha > 0.99) & (gt_depth > 0))
        return im_w * l1_tracking(out.color, gt_color, mask) + depth_w * (
            l1_tracking(out.depth, gt_depth, mask)
        )

    l_ref, (gq_ref, gt_ref) = jax.value_and_grad(xla_loss, argnums=(0, 1))(
        quat0, trans0
    )

    gt4 = tile_gt_images(gt_color, gt_depth, cam, cfg)

    def fused(q, t):
        screen, vjp = jax.vjp(
            lambda q_, t_: preprocess_instances(raw, pose_to_matrix(q_, t_), cam),
            q, t,
        )
        img, dep, d_screen = tracking_loss_grad(
            screen, bins.counts, gt4, cam, cfg, im_w, depth_w, use_sur,
            interpret=True,
        )
        gq, gt_ = vjp(d_screen)
        return img + dep, gq, gt_

    l_f, gq_f, gt_f = fused(quat0, trans0)
    np.testing.assert_allclose(float(l_f), float(l_ref),
                               rtol=2e-5 if exact else 2e-3)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_ref), rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_ref), rtol=5e-3, atol=1e-3)


@pytest.mark.parametrize("exact", [True, False])
def test_flat_chunk_blend_matches_tiled(rng, exact):
    """The flat-chunk mapping path (ChunkBins + _blend_flat) must match the
    XLA tiled renderer in outputs AND parameter gradients. exact=False
    covers the lean fast chunk math (past-stop tails bounded by the 1e-4
    exit transmittance)."""
    from gsorb_slam_tpu.raster.binning import chunk_layout, tile_grid_shape
    from gsorb_slam_tpu.raster.pallas_raster import render_pallas_flat

    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                       exact_stop=exact, chunk_budget=64)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    ty, tx = tile_grid_shape(cam, cfg)
    cbins = chunk_layout(bins, ty * tx, cfg.chunk, cfg.chunk_budget)
    assert int(cbins.n_chunks) <= cfg.chunk_budget

    tol = 5e-5 if exact else 3e-4
    ref = render_tiled(prep, bins, cam, cfg)
    out = render_pallas_flat(prep, cbins, cam, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), atol=tol)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), atol=2 * tol)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha), atol=tol)
    np.testing.assert_allclose(
        np.asarray(out.final_t), np.asarray(ref.final_t), atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(out.median_depth), np.asarray(ref.median_depth), atol=2 * tol
    )

    # parameter gradients through preprocess (the mapping consumer)
    import dataclasses as dc

    gt = jax.lax.stop_gradient(ref.color) * 0.9

    def loss_tiled(means):
        p = dc.replace(prep, mean2d=prep.mean2d + means)
        o = render_tiled(p, bins, cam, cfg)
        return jnp.sum(jnp.abs(o.color - gt)) + jnp.sum(o.depth) + jnp.sum(o.alpha)

    def loss_flat(means):
        p = dc.replace(prep, mean2d=prep.mean2d + means)
        o = render_pallas_flat(p, cbins, cam, cfg, interpret=True)
        return jnp.sum(jnp.abs(o.color - gt)) + jnp.sum(o.depth) + jnp.sum(o.alpha)

    z = jnp.zeros_like(prep.mean2d)
    g_ref = jax.grad(loss_tiled)(z)
    g_flat = jax.grad(loss_flat)(z)
    np.testing.assert_allclose(
        np.asarray(g_flat), np.asarray(g_ref),
        atol=2e-4 if exact else 8e-4, rtol=2e-3,
    )


def test_flat_chunk_blend_with_background(rng):
    """Nonzero background couples final_t into the color gradient — the
    flat path's suffix init (tfin * gT) must carry it."""
    from gsorb_slam_tpu.raster.binning import chunk_layout, tile_grid_shape
    from gsorb_slam_tpu.raster.pallas_raster import render_pallas_flat

    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                       exact_stop=True, chunk_budget=64)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=200, capacity=256)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    ty, tx = tile_grid_shape(cam, cfg)
    cbins = chunk_layout(bins, ty * tx, cfg.chunk, cfg.chunk_budget)
    import dataclasses as dc

    bg = 0.35

    def loss_tiled(dop):
        p = dc.replace(prep, opacity=prep.opacity + dop)
        o = render_tiled(p, bins, cam, cfg, bg=bg)
        return jnp.sum(o.color ** 2)

    def loss_flat(dop):
        p = dc.replace(prep, opacity=prep.opacity + dop)
        o = render_pallas_flat(p, cbins, cam, cfg, bg=bg, interpret=True)
        return jnp.sum(o.color ** 2)

    z = jnp.zeros_like(prep.opacity)
    np.testing.assert_allclose(
        float(loss_flat(z)), float(loss_tiled(z)), rtol=1e-5
    )
    g_ref = jax.grad(loss_tiled)(z)
    g_flat = jax.grad(loss_flat)(z)
    np.testing.assert_allclose(
        np.asarray(g_flat), np.asarray(g_ref), atol=2e-4, rtol=2e-3
    )


@pytest.mark.parametrize("exact", [True, False])
def test_fused_tracking_tile_ids_sharding(rng, exact):
    """Strided tile subsets (the mesh tracking layout) must reproduce the
    identity run: per-tile grads row-for-row, and shard losses summing to
    the full loss. This is the invariant parallel/tracking.py relies on."""
    from gsorb_slam_tpu.raster.pallas_raster import (
        _pack_instances,
        tile_gt_images,
        tracking_loss_grad,
    )

    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                       exact_stop=exact, fused_tiles_per_step=2)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    packed = _pack_instances(prep, bins)
    T = packed.shape[0]

    gt_color = jnp.asarray(rng.uniform(size=(cam.height, cam.width, 3)),
                           jnp.float32)
    gt_depth = jnp.asarray(rng.uniform(1.0, 3.0, size=(cam.height, cam.width)),
                           jnp.float32)
    gt4 = tile_gt_images(gt_color, gt_depth, cam, cfg)

    img_full, dep_full, g_full = tracking_loss_grad(
        packed, bins.counts, gt4, cam, cfg, 0.9, 0.3, True, interpret=True,
    )

    n_shards = 2
    img_sum, dep_sum = 0.0, 0.0
    for s in range(n_shards):
        ids = jnp.arange(s, T, n_shards, dtype=jnp.int32)
        img_s, dep_s, g_s = tracking_loss_grad(
            packed[ids], bins.counts[ids], gt4[ids], cam, cfg,
            0.9, 0.3, True, interpret=True, tile_ids=ids,
        )
        img_sum += float(img_s)
        dep_sum += float(dep_s)
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_full[ids]), rtol=1e-5, atol=1e-7,
            err_msg=f"shard {s}",
        )
    np.testing.assert_allclose(img_sum, float(img_full), rtol=1e-5)
    np.testing.assert_allclose(dep_sum, float(dep_full), rtol=1e-5)


def test_fused_tracking_elem_bf16_close_to_f32(rng):
    """elem_bf16 runs the [K, px] slab chain in packed bf16 (the VPU-pass-
    bound fast path's throughput mode). Its per-element weights carry ~0.4%
    relative error; the SUMMED losses and per-instance gradients must stay
    within a few percent of the f32 fast path — enough for pose Adam, whose
    gradient is a further sum over all instances."""
    from gsorb_slam_tpu.raster.pallas_raster import (
        _pack_instances,
        tile_gt_images,
        tracking_loss_grad,
    )

    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                       exact_stop=False, fused_tiles_per_step=2)
    cfg16 = dataclasses.replace(cfg, elem_bf16=True)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    packed = _pack_instances(prep, bins)

    gt_color = jnp.asarray(rng.uniform(size=(cam.height, cam.width, 3)),
                           jnp.float32)
    gt_depth = jnp.asarray(rng.uniform(1.0, 3.0, size=(cam.height, cam.width)),
                           jnp.float32)
    # The in-kernel loss mask thresholds accumulated saturation (S > 0.99)
    # PER MODE: bf16-rounded weights flip barely-saturated pixels (measured
    # 8/3072 on this scene = 3.5% of the summed loss), which is a property
    # of the discrete threshold, not of the continuous math. Excluding an
    # S-band of +/-0.005 around the threshold via gtd=0 (part of the mask,
    # identical in both modes; |S_e16 - S_f32| <= 0.0026 measured) makes
    # every downstream comparison tight.
    from gsorb_slam_tpu.raster.binning import chunk_layout, tile_grid_shape
    from gsorb_slam_tpu.raster.pallas_raster import render_pallas_flat

    ty, tx = tile_grid_shape(cam, cfg)
    cbins = chunk_layout(bins, ty * tx, cfg.chunk, 64)
    S_f = render_pallas_flat(prep, cbins, cam, cfg, interpret=True).alpha
    stable = jnp.abs(S_f - 0.99) > 0.005
    gt_depth = jnp.where(stable, gt_depth, 0.0)
    gt4 = tile_gt_images(gt_color, gt_depth, cam, cfg)

    img_f, dep_f, g_f = tracking_loss_grad(
        packed, bins.counts, gt4, cam, cfg, 0.7, 1.0, False, interpret=True,
    )
    img_e, dep_e, g_e = tracking_loss_grad(
        packed, bins.counts, gt4, cam, cfg16, 0.7, 1.0, False, interpret=True,
    )
    # Masked-L1 SUM losses over thousands of pixels at an identical mask.
    np.testing.assert_allclose(float(img_e), float(img_f), rtol=1e-2)
    np.testing.assert_allclose(float(dep_e), float(dep_f), rtol=1e-2)
    a, b = np.asarray(g_f[:, :10, :]), np.asarray(g_e[:, :10, :])
    scale = np.abs(a).max()
    # Per-instance gradients: a few percent of the gradient scale.
    np.testing.assert_allclose(b, a, atol=4e-2 * max(scale, 1e-3))
    # Summed gradient direction: a 20-instance partial sum gets limited
    # cancellation of the ~1% per-element bf16 noise (measured 3.9% worst
    # component); the FULL pose gradient is gated compiled at 8e-2 by
    # scripts/tpu_smoke.py.
    sa, sb = a.sum(axis=(0, 2)), b.sum(axis=(0, 2))
    np.testing.assert_allclose(sb, sa, atol=5e-2 * max(np.abs(sa).max(), 1e-3))


def test_flat_blend_elem_bf16_close_to_f32(rng):
    """Same contract for the flat-chunk mapping path: elem_bf16 outputs and
    per-Gaussian gradients within bf16 noise of the f32 fast path."""
    from gsorb_slam_tpu.raster.binning import chunk_layout, tile_grid_shape
    from gsorb_slam_tpu.raster.pallas_raster import render_pallas_flat

    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                       exact_stop=False, chunk_budget=64)
    cfg16 = dataclasses.replace(cfg, elem_bf16=True)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=250, capacity=256)
    prep0 = _prep(scene, cam)
    bins = bin_gaussians(prep0, cam, cfg)
    ty, tx = tile_grid_shape(cam, cfg)
    cbins = chunk_layout(bins, ty * tx, cfg.chunk, cfg.chunk_budget)

    def loss(op, c):
        p = dataclasses.replace(prep0, opacity=op)
        out = render_pallas_flat(p, cbins, cam, c, interpret=True)
        return (
            jnp.mean(jnp.abs(out.color)) + 0.3 * jnp.mean(jnp.abs(out.depth))
            + 0.1 * jnp.mean(out.alpha)
        )

    l_f, g_f = jax.value_and_grad(lambda op: loss(op, cfg))(prep0.opacity)
    l_e, g_e = jax.value_and_grad(lambda op: loss(op, cfg16))(prep0.opacity)
    np.testing.assert_allclose(float(l_e), float(l_f), rtol=2e-2)
    a, b = np.asarray(g_f), np.asarray(g_e)
    np.testing.assert_allclose(b, a, atol=4e-2 * max(np.abs(a).max(), 1e-3))

    # The strong contract for the tracking loss: at a FIXED saturation mask
    # (f32's), the elem16 masked-L1 matches f32 to ~bf16-accumulation noise.
    # (The in-kernel loss also thresholds S>0.99 per mode; that discrete
    # mask is the only thing elem16 moves by more than a few 1e-4.)
    o_f = render_pallas_flat(prep0, cbins, cam, cfg, interpret=True)
    o_e = render_pallas_flat(prep0, cbins, cam, cfg16, interpret=True)
    gt_c = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(0), (cam.height, cam.width, 3))
    )
    m = np.asarray(o_f.alpha) > 0.99
    l1_f = float((np.abs(np.asarray(o_f.color) - gt_c).sum(-1) * m).sum())
    l1_e = float((np.abs(np.asarray(o_e.color) - gt_c).sum(-1) * m).sum())
    np.testing.assert_allclose(l1_e, l1_f, rtol=2e-3)


@pytest.mark.slow
def test_flat_group_invariance(rng):
    """``flat_group`` (chunks per grid step in the flat blend) is a pure
    scheduling knob: outputs and parameter gradients must agree across
    group sizes to float-roundoff (asserted at rtol~1e-6 in interpret
    mode; compiled-TPU parity for G>1 is covered by the tpu_smoke gate run
    in bench.py), including a chunk budget that is NOT a multiple of the
    group (exercising the dead-chunk padding path)."""
    from gsorb_slam_tpu.raster.binning import chunk_layout, tile_grid_shape
    from gsorb_slam_tpu.raster.pallas_raster import render_pallas_flat

    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    results = {}
    for G in (1, 3, 4):
        cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                           exact_stop=False, chunk_budget=42, flat_group=G)
        prep = _prep(scene, cam)
        bins = bin_gaussians(prep, cam, cfg)
        ty, tx = tile_grid_shape(cam, cfg)
        cbins = chunk_layout(bins, ty * tx, cfg.chunk, cfg.chunk_budget)

        def loss(lop):
            s = dict(scene)
            p = preprocess(
                s["means"], s["rgb"], s["quats"], lop, s["log_scales"],
                s["active"], identity_pose(), cam,
            )
            o = render_pallas_flat(p, cbins, cam, cfg, interpret=True)
            return (jnp.sum(o.color ** 2) + jnp.sum(o.depth)
                    + jnp.sum(o.alpha * o.final_t))

        l, g = jax.value_and_grad(loss)(scene["logit_opacities"])
        results[G] = (float(l), np.asarray(g))
    for G in (3, 4):
        np.testing.assert_allclose(results[G][0], results[1][0], rtol=1e-6)
        np.testing.assert_allclose(results[G][1], results[1][1],
                                   atol=1e-6, rtol=1e-5)


def test_preprocess_pallas_matches_xla(rng):
    """The Pallas instance-EWA pair (fwd + in-kernel-vjp pose cotangent)
    must match the XLA preprocess_instances chain in interpret mode;
    compiled parity is gated by scripts/tpu_smoke.py."""
    from gsorb_slam_tpu.raster.binning import bin_gaussians
    from gsorb_slam_tpu.raster.instances import (
        pack_raw_instances,
        preprocess_instances,
    )
    from gsorb_slam_tpu.raster.preprocess_pallas import (
        preprocess_instances_pallas,
        rt_from_matrix,
    )

    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=500, capacity=512)
    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64)
    T = jnp.eye(4).at[:3, 3].set(jnp.array([0.02, -0.01, 0.03]))
    prep = _prep(scene, cam, pose=T)
    bins = bin_gaussians(prep, cam, cfg)
    raw = pack_raw_instances(
        scene["means"], scene["rgb"], scene["quats"],
        scene["logit_opacities"], scene["log_scales"], scene["active"], bins,
    )

    ref = preprocess_instances(raw, T, cam, 1.0)
    # group=3 exercises the tile-padding path (13 tiles -> 15)
    out = preprocess_instances_pallas(raw, rt_from_matrix(T), cam, 1.0, 3, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    ct = jax.random.normal(jax.random.PRNGKey(0), ref.shape)

    def loss_ref(T):
        return jnp.sum(preprocess_instances(raw, T, cam, 1.0) * ct)

    def loss_pal(T):
        return jnp.sum(
            preprocess_instances_pallas(raw, rt_from_matrix(T), cam, 1.0, 3, True)
            * ct
        )

    gr = np.asarray(jax.grad(loss_ref)(T))[:3, :4]
    gp = np.asarray(jax.grad(loss_pal)(T))[:3, :4]
    np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-3 * np.abs(gr).max())


def test_sorted_pack_grad_matches_scatter(rng):
    """The sorted-segment pack backward (flat_pack_grad_aux +
    _rows_gather_sorted, RasterConfig.sorted_pack_grad) is numerically a
    reordering of the same per-instance gradient sum: parameter gradients
    through render_pallas_flat must match the plain scatter-add transpose
    to float tolerance."""
    import dataclasses as dc

    from gsorb_slam_tpu.raster.binning import chunk_layout, tile_grid_shape
    from gsorb_slam_tpu.raster.pallas_raster import (
        flat_pack_grad_aux,
        render_pallas_flat,
    )

    cfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64,
                       exact_stop=False, chunk_budget=64)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    ty, tx = tile_grid_shape(cam, cfg)
    cbins = chunk_layout(bins, ty * tx, cfg.chunk, cfg.chunk_budget)
    aux = flat_pack_grad_aux(cbins.indices, prep.depth.shape[0])

    gt = jax.lax.stop_gradient(render_tiled(prep, bins, cam, cfg).color) * 0.9

    def loss(means, aux_):
        p = dc.replace(prep, mean2d=prep.mean2d + means)
        o = render_pallas_flat(p, cbins, cam, cfg, interpret=True,
                               pack_aux=aux_)
        return jnp.sum(jnp.abs(o.color - gt)) + jnp.sum(o.depth) + jnp.sum(o.alpha)

    z = jnp.zeros_like(prep.mean2d)
    # identical forward
    np.testing.assert_allclose(float(loss(z, None)), float(loss(z, aux)),
                               rtol=1e-6)
    g_scatter = jax.grad(lambda m: loss(m, None))(z)
    g_sorted = jax.grad(lambda m: loss(m, aux))(z)
    np.testing.assert_allclose(np.asarray(g_sorted), np.asarray(g_scatter),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["f32", "bf16", "elem16"])
def test_fused_chunk_batch_matches_unbatched(rng, mode):
    """The super-chunk-batched fast kernel (fused_chunk_batch > 1) computes
    the same blend: the K-linear math is merely batched across chunks and
    dead rows self-mask, so loss and instance grads must match the
    per-chunk path to accumulation-order tolerance. Early exit coarsens to
    super granularity — covered by making the scene NON-saturating so both
    paths execute every live chunk."""
    import dataclasses as dc

    from gsorb_slam_tpu.raster.pallas_raster import (
        _pack_instances,
        tile_gt_images,
        tracking_loss_grad,
    )

    cfg = RasterConfig(
        tile=16, tile_capacity=256, max_dup=16, chunk=64,
        exact_stop=False, fused_tiles_per_step=2,
        blend_bf16=mode in ("bf16", "elem16"), elem_bf16=mode == "elem16",
    )
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    packed = _pack_instances(prep, bins)
    scene2 = random_cloud_scene(rng, n=300, capacity=384)
    prep2 = _prep(scene2, cam)
    bins2 = bin_gaussians(prep2, cam, cfg)
    ref2 = render_tiled(prep2, bins2, cam, cfg)
    gt_color = jax.lax.stop_gradient(ref2.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(ref2.alpha > 0.3, ref2.median_depth, 0.0)
    )
    gt4 = tile_gt_images(gt_color, gt_depth, cam, cfg)

    outs = {}
    for cb in (1, 2, 4):
        cfg_b = dc.replace(cfg, fused_chunk_batch=cb)
        img, dep, grads = tracking_loss_grad(
            packed, bins.counts, gt4, cam, cfg_b, 0.7, 1.0, False,
            interpret=True,
        )
        outs[cb] = (float(img + dep), np.asarray(grads))
    for cb in (2, 4):
        np.testing.assert_allclose(outs[cb][0], outs[1][0], rtol=3e-4,
                                   err_msg=f"cb={cb} mode={mode}")
        a = outs[cb][1][:, :10, :]
        b = outs[1][1][:, :10, :]
        if mode == "f32":
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=3e-3,
                                       err_msg=f"cb={cb} mode={mode}")
        else:
            # bf16 slab modes: reordered f32 summation of the suffix carry
            # can flip isolated gate comparisons at the S-band threshold
            # (the documented elem16 discrete-flip class) — bound the
            # FRACTION of such flips, not each element.
            bad = ~np.isclose(a, b, atol=2e-3, rtol=3e-3)
            frac = bad.mean()
            assert frac < 5e-4, (f"cb={cb} mode={mode}: {bad.sum()} of "
                                 f"{bad.size} grads diverged ({frac:.2e})")
