"""Paired-rect fused tracking kernel vs XLA autodiff (interpret mode).

The paired kernel packs two vertically-adjacent 16x8 tiles into one
256-lane slab (raster/paired.py). Reference: the portable XLA blend over
the SAME rect (16x8) binning in row-major order, differentiated with
autodiff — the same methodology as test_pallas.py's fused-kernel tests.
Compiled-vs-XLA parity on hardware is gated by scripts/tpu_smoke.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsorb_slam_tpu.ops.losses import l1_tracking
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess, render_tiled
from gsorb_slam_tpu.raster.binning import tile_grid_shape
from gsorb_slam_tpu.raster.instances import blend_packed_xla
from gsorb_slam_tpu.raster.pallas_raster import _pack_instances
from gsorb_slam_tpu.raster.paired import (
    pack_gt_pairs,
    pair_permutation,
    tracking_loss_grad_paired,
)

from tests.scenes import identity_pose, random_cloud_scene, tiny_camera

CFG = RasterConfig(
    tile=16, tile_h=8, tile_capacity=256, max_dup=16, chunk=64,
    exact_stop=False, fused_tiles_per_step=2,
)


def _prep(scene, cam, pose=None):
    return preprocess(
        scene["means"], scene["rgb"], scene["quats"], scene["logit_opacities"],
        scene["log_scales"], scene["active"],
        pose if pose is not None else identity_pose(), cam,
    )


def _scene_setup(rng, cfg):
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    packed_rm = _pack_instances(prep, bins)  # row-major rect tiles

    scene2 = random_cloud_scene(rng, n=300, capacity=384)
    prep2 = _prep(scene2, cam)
    sq = dataclasses.replace(cfg, tile_h=0)
    bins2 = bin_gaussians(prep2, cam, sq)
    ref2 = render_tiled(prep2, bins2, cam, sq)
    gt_color = jax.lax.stop_gradient(ref2.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(ref2.alpha > 0.3, ref2.median_depth, 0.0)
    )
    return cam, bins, packed_rm, gt_color, gt_depth


def test_pair_permutation_roundtrip():
    ty, tx = 6, 4
    perm = pair_permutation(ty, tx)
    assert sorted(perm.tolist()) == list(range(ty * tx))
    # slot 2p / 2p+1 are vertically adjacent rect tiles (same column,
    # consecutive rows) covering square tile p.
    for p in range(ty // 2 * tx):
        a, b = perm[2 * p], perm[2 * p + 1]
        assert b == a + tx
        assert (a // tx) % 2 == 0


@pytest.mark.parametrize("use_sur", [True, False])
def test_paired_tracking_matches_xla_autodiff(rng, use_sur):
    cam, bins, packed_rm, gt_color, gt_depth = _scene_setup(rng, CFG)
    ty, tx = tile_grid_shape(cam, CFG)
    perm = pair_permutation(ty, tx)

    im_w, depth_w = 0.7, 1.0

    def loss_fn(p):
        out = blend_packed_xla(p, bins.counts, cam, CFG)
        mask = jax.lax.stop_gradient((out.alpha > 0.99) & (gt_depth > 0))
        image_l1 = l1_tracking(out.color, gt_color, mask)
        dpred = out.median_depth if use_sur else out.depth
        return im_w * image_l1 + depth_w * l1_tracking(dpred, gt_depth, mask)

    loss_ref, g_ref = jax.value_and_grad(loss_fn)(packed_rm)

    gt_pairs = pack_gt_pairs(gt_color, gt_depth, cam, CFG)
    img_l1, dep_l1, grads_pm = tracking_loss_grad_paired(
        packed_rm[perm], bins.counts[perm], gt_pairs, cam, CFG,
        im_w, depth_w, use_sur, interpret=True,
    )
    loss_fused = img_l1 + dep_l1
    np.testing.assert_allclose(
        float(loss_fused), float(loss_ref), rtol=2e-3,
        err_msg=f"use_sur={use_sur}",
    )
    # un-permute to row-major for the comparison
    grads_rm = np.zeros_like(np.asarray(g_ref))
    grads_rm[perm] = np.asarray(grads_pm)
    np.testing.assert_allclose(
        grads_rm[:, :10, :], np.asarray(g_ref[:, :10, :]),
        atol=8e-4, rtol=2e-3, err_msg=f"use_sur={use_sur}",
    )


def test_paired_pose_gradient_e2e(rng):
    """Pose gradient through preprocess_instances + paired kernel equals the
    full-XLA autodiff pose gradient over the same rect binning (the
    production paired tracking iteration)."""
    from gsorb_slam_tpu.core.transforms import matrix_to_pose, pose_to_matrix
    from gsorb_slam_tpu.raster.instances import (
        pack_raw_instances,
        preprocess_instances,
    )

    cfg = CFG
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=250, capacity=256)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    ty, tx = tile_grid_shape(cam, cfg)
    perm = pair_permutation(ty, tx)
    perm_j = jnp.asarray(perm)
    from gsorb_slam_tpu.raster.binning import TileBins

    bins_pm = TileBins(
        indices=bins.indices[perm_j], counts=bins.counts[perm_j],
        n_dropped=bins.n_dropped,
    )
    raw_rm = pack_raw_instances(
        scene["means"], scene["rgb"], scene["quats"],
        scene["logit_opacities"], scene["log_scales"], scene["active"], bins,
    )
    raw_pm = pack_raw_instances(
        scene["means"], scene["rgb"], scene["quats"],
        scene["logit_opacities"], scene["log_scales"], scene["active"], bins_pm,
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
        screen = preprocess_instances(raw_rm, pose_to_matrix(q, t), cam)
        out = blend_packed_xla(screen, bins.counts, cam, cfg)
        mask = jax.lax.stop_gradient((out.alpha > 0.99) & (gt_depth > 0))
        return im_w * l1_tracking(out.color, gt_color, mask) + depth_w * (
            l1_tracking(out.depth, gt_depth, mask)
        )

    l_ref, (gq_ref, gt_ref) = jax.value_and_grad(xla_loss, argnums=(0, 1))(
        quat0, trans0
    )

    gt_pairs = pack_gt_pairs(gt_color, gt_depth, cam, cfg)

    def fused(q, t):
        screen, vjp = jax.vjp(
            lambda q_, t_: preprocess_instances(raw_pm, pose_to_matrix(q_, t_), cam),
            q, t,
        )
        img, dep, d_screen = tracking_loss_grad_paired(
            screen, bins_pm.counts, gt_pairs, cam, cfg,
            im_w, depth_w, use_sur, interpret=True, tile_ids=perm_j,
        )
        gq, gt_ = vjp(d_screen)
        return img + dep, gq, gt_

    l_f, gq_f, gt_f = fused(quat0, trans0)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_ref),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_ref),
                               rtol=5e-3, atol=1e-3)


def test_paired_elem_bf16_close_to_f32(rng):
    """elem_bf16 paired kernel within bf16 noise of the f32 paired kernel
    (mirrors the square kernel's contract in test_pallas.py)."""
    cam, bins, packed_rm, gt_color, gt_depth = _scene_setup(rng, CFG)
    ty, tx = tile_grid_shape(cam, CFG)
    perm = pair_permutation(ty, tx)

    # exclude barely-saturated pixels (S within 0.005 of the 0.99 mask
    # threshold): the discrete mask is the only thing bf16 moves much.
    out = blend_packed_xla(packed_rm, bins.counts, cam, CFG)
    stable = jnp.abs(out.alpha - 0.99) > 0.005
    gt_depth = jnp.where(stable, gt_depth, 0.0)
    gt_pairs = pack_gt_pairs(gt_color, gt_depth, cam, CFG)

    cfg16 = dataclasses.replace(CFG, elem_bf16=True, blend_bf16=True)
    img_f, dep_f, g_f = tracking_loss_grad_paired(
        packed_rm[perm], bins.counts[perm], gt_pairs, cam, CFG,
        0.7, 1.0, False, interpret=True,
    )
    img_e, dep_e, g_e = tracking_loss_grad_paired(
        packed_rm[perm], bins.counts[perm], gt_pairs, cam, cfg16,
        0.7, 1.0, False, interpret=True,
    )
    np.testing.assert_allclose(float(img_e), float(img_f), rtol=1e-2)
    np.testing.assert_allclose(float(dep_e), float(dep_f), rtol=1e-2)
    a, b = np.asarray(g_f[:, :10, :]), np.asarray(g_e[:, :10, :])
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=4e-2 * max(scale, 1e-3))


def test_paired_pad_pairs(rng):
    """A pair count that is NOT a multiple of fused_tiles_per_step exercises
    the pad path; results must match the unpadded (B=1) run exactly."""
    cam, bins, packed_rm, gt_color, gt_depth = _scene_setup(rng, CFG)
    ty, tx = tile_grid_shape(cam, CFG)
    perm = pair_permutation(ty, tx)
    gt_pairs = pack_gt_pairs(gt_color, gt_depth, cam, CFG)

    results = {}
    for B in (1, 5):  # 12 pairs: B=5 pads to 15
        cfg = dataclasses.replace(CFG, fused_tiles_per_step=B)
        results[B] = tracking_loss_grad_paired(
            packed_rm[perm], bins.counts[perm], gt_pairs, cam, cfg,
            0.7, 1.0, True, interpret=True,
        )
    np.testing.assert_allclose(
        float(results[5][0]), float(results[1][0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(results[5][1]), float(results[1][1]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(results[5][2]), np.asarray(results[1][2]),
        atol=1e-7, rtol=1e-6,
    )


def test_track_frame_paired_recovers_pose(rng):
    """track_frame with RasterConfig.paired (the production integration:
    pair-major bins/pack, paired gt tiles, in-loop rebin permutation) must
    recover a perturbed pose like the square path does."""
    import dataclasses as dc

    from gsorb_slam_tpu.core.config import TrackingConfig
    from gsorb_slam_tpu.core.transforms import pose_to_matrix
    from gsorb_slam_tpu.slam.tracking import FeatureMatches, track_frame
    from gsorb_slam_tpu.splat.gaussians import empty_map
    from gsorb_slam_tpu.raster.tiled import render

    cam = tiny_camera(w=64, h=48, f=60.0)
    scene = random_cloud_scene(rng, n=600, capacity=640, spread=1.6)
    scene["logit_opacities"] = jnp.full_like(scene["logit_opacities"], 6.0)
    gm = empty_map(scene["means"].shape[0])
    gm = dc.replace(
        gm, means=scene["means"], rgb=scene["rgb"], quats=scene["quats"],
        logit_opacities=scene["logit_opacities"],
        log_scales=scene["log_scales"], active=scene["active"],
        count=jnp.asarray(scene["means"].shape[0], jnp.int32),
    )
    rcfg = dataclasses.replace(
        CFG, paired=True, backend="pallas", dilate_px=2.0, tile_capacity=256,
    )
    sq = dataclasses.replace(rcfg, paired=False, tile_h=0)
    T_gt = np.eye(4, dtype=np.float32)
    out_gt = render(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, jnp.asarray(T_gt), cam, sq,
    )
    gt_color = out_gt.color
    gt_depth = jnp.where(out_gt.alpha > 0.5, out_gt.median_depth, 0.0)
    T_init = np.asarray(
        pose_to_matrix(
            jnp.array([1.0, 0.004, -0.003, 0.005]),
            jnp.array([0.015, -0.01, 0.012]),
        )
    )
    tcfg = TrackingConfig(num_iters=30, use_sur_depth=True)
    res = track_frame(
        gm, jnp.asarray(T_init), gt_color, gt_depth, FeatureMatches.empty(),
        cam, tcfg, rcfg, rebin_iters=(8,),
    )
    err_init = np.linalg.norm(T_init[:3, 3] - T_gt[:3, 3])
    err_final = np.linalg.norm(np.asarray(res.T_cw)[:3, 3] - T_gt[:3, 3])
    assert err_final < 0.6 * err_init, (err_init, err_final)
    assert np.isfinite(float(res.loss))


def test_count_sorted_pairing_matches_vertical(rng):
    """Count-sorted pairing (the production default, paired_sort=True) is
    a pure re-pairing: loss and un-permuted gradients must match the
    static vertical pairing bit-for-bit in exact arithmetic (each lane
    half blends only its own tile's instances; pairing choice only
    changes which halves share a slab)."""
    from gsorb_slam_tpu.raster.paired import count_sorted_pair_permutation

    cam, bins, packed_rm, gt_color, gt_depth = _scene_setup(rng, CFG)
    ty, tx = tile_grid_shape(cam, CFG)
    perm_v = pair_permutation(ty, tx)
    perm_s = np.asarray(count_sorted_pair_permutation(bins.counts))
    assert sorted(perm_s.tolist()) == list(range(ty * tx))
    # sorted pairing really changes the pairing on this scene
    assert not np.array_equal(perm_s, perm_v)

    im_w, depth_w = 0.7, 1.0
    outs = {}
    for name, perm in (("vertical", perm_v), ("sorted", perm_s)):
        perm_j = jnp.asarray(perm)
        gt_pairs = pack_gt_pairs(gt_color, gt_depth, cam, CFG, perm=perm_j)
        img_l1, dep_l1, grads_pm = tracking_loss_grad_paired(
            packed_rm[perm_j], bins.counts[perm_j], gt_pairs, cam, CFG,
            im_w, depth_w, False, interpret=True, tile_ids=perm_j,
        )
        grads_rm = np.zeros_like(np.asarray(grads_pm))
        grads_rm[np.asarray(perm)] = np.asarray(grads_pm)
        outs[name] = (float(img_l1 + dep_l1), grads_rm)
    np.testing.assert_allclose(outs["sorted"][0], outs["vertical"][0],
                               rtol=1e-6)
    np.testing.assert_allclose(outs["sorted"][1][:, :10, :],
                               outs["vertical"][1][:, :10, :],
                               atol=1e-5, rtol=1e-4)
