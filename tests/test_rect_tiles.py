"""Rectangular-tile (tile_h != tile) parity: the oracle/XLA/Pallas chain
must agree with the square-tile renders — tile shape is a pure work-shape
choice (CUDA fixes BLOCK 16x16, ``cuda_rasterizer/config.h:15-17``; on TPU
a half-height tile halves the [chunk, px] slab element work)."""

import numpy as np
import pytest

from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, render_tiled
from gsorb_slam_tpu.raster.naive import render_naive
from gsorb_slam_tpu.raster.pallas_raster import render_pallas

from tests.scenes import random_cloud_scene, tiny_camera
from tests.test_pallas import _prep

SQ = RasterConfig(tile=16, tile_capacity=512, max_dup=16, chunk=128)
RECT = RasterConfig(tile=16, tile_h=8, tile_capacity=512, max_dup=16, chunk=128)


def test_rect_xla_matches_square_xla(rng):
    """Same scene through 16x16 and 16x8 XLA tiling: culling rects differ,
    but every alpha >= 1/255 contribution is preserved by construction, so
    blended outputs match to accumulation noise."""
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    ref = render_tiled(prep, bin_gaussians(prep, cam, SQ), cam, SQ)
    out = render_tiled(prep, bin_gaussians(prep, cam, RECT), cam, RECT)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=1e-4)


def test_rect_pallas_matches_rect_xla(rng):
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, RECT)
    ref = render_tiled(prep, bins, cam, RECT)
    out = render_pallas(prep, bins, cam, RECT, interpret=True)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.final_t),
                               np.asarray(ref.final_t), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.median_depth),
                               np.asarray(ref.median_depth), atol=1e-4)


def test_rect_fused_tracking_matches_xla(rng):
    """The fused tracking kernel at 16x8 tiles (fast path) vs XLA autodiff —
    the production use of rectangular tiles."""
    import jax
    import jax.numpy as jnp

    from gsorb_slam_tpu.ops.losses import l1_tracking
    from gsorb_slam_tpu.raster.instances import blend_packed_xla
    from gsorb_slam_tpu.raster.pallas_raster import (
        _pack_instances,
        tile_gt_images,
        tracking_loss_grad,
    )

    cfg = RasterConfig(tile=16, tile_h=8, tile_capacity=256, max_dup=16,
                       chunk=64, exact_stop=False, fused_tiles_per_step=4)
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=300, capacity=384)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, cfg)
    packed = _pack_instances(prep, bins)

    scene2 = random_cloud_scene(rng, n=300, capacity=384)
    prep2 = _prep(scene2, cam)
    ref2 = render_tiled(prep2, bin_gaussians(prep2, cam, cfg), cam, cfg)
    gt_color = jax.lax.stop_gradient(ref2.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(ref2.alpha > 0.3, ref2.median_depth, 0.0)
    )

    im_w, depth_w = 0.7, 1.0

    def loss_fn(p):
        out = blend_packed_xla(p, bins.counts, cam, cfg)
        mask = jax.lax.stop_gradient((out.alpha > 0.99) & (gt_depth > 0))
        image_l1 = l1_tracking(out.color, gt_color, mask)
        return im_w * image_l1 + depth_w * l1_tracking(out.depth, gt_depth, mask)

    loss_ref, g_ref = jax.value_and_grad(loss_fn)(packed)
    gt4 = tile_gt_images(gt_color, gt_depth, cam, cfg)
    img_l1, dep_l1, grads = tracking_loss_grad(
        packed, bins.counts, gt4, cam, cfg, im_w, depth_w, False,
        interpret=True,
    )
    np.testing.assert_allclose(float(img_l1 + dep_l1), float(loss_ref),
                               rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(grads[:, :10, :]), np.asarray(g_ref[:, :10, :]),
        atol=8e-4, rtol=2e-3,
    )


def test_rect_oracle_agreement(rng):
    """Dense oracle at the rectangular tile shape (the oracle applies the
    same per-tile rect culling, so it validates the rect path end to end)."""
    cam = tiny_camera()
    scene = random_cloud_scene(rng, n=120, capacity=128)
    prep = _prep(scene, cam)
    bins = bin_gaussians(prep, cam, RECT)
    ref = render_naive(prep, cam, cfg=RECT)
    out = render_tiled(prep, bins, cam, RECT)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=1e-4)
