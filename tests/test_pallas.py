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
