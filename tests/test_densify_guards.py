"""Bounded-capacity densify guards (no reference analog — the CUDA side
reallocates unboundedly): saturated-tile suppression and the worst-first
per-frame add budget (``slam/mapping.densify_frame``)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import MappingConfig
from gsorb_slam_tpu.raster.types import RasterConfig, RenderOutput
from gsorb_slam_tpu.slam.mapping import densify_frame
from gsorb_slam_tpu.splat.gaussians import empty_map


def _setup(h=32, w=48):
    cam = Camera(fx=40.0, fy=40.0, cx=w / 2, cy=h / 2, width=w, height=h)
    # Render showing NOTHING (alpha 0 everywhere) vs valid gt depth:
    # every pixel is a c2 (alpha < 0.8) add candidate.
    out = RenderOutput(
        color=jnp.zeros((h, w, 3)),
        depth=jnp.zeros((h, w)),
        alpha=jnp.zeros((h, w)),
        median_depth=jnp.zeros((h, w)),
        final_t=jnp.ones((h, w)),
        radii=jnp.zeros((4,)),
    )
    gt_color = jnp.full((h, w, 3), 0.5)
    gt_depth = jnp.full((h, w), 2.0)
    return cam, out, gt_color, gt_depth


def test_budget_caps_adds_worst_first():
    cam, out, gt_color, gt_depth = _setup()
    gm = empty_map(4096)
    mcfg = dataclasses.replace(MappingConfig(), max_adds_per_frame=100)
    # Make 40 pixels strictly worse (bigger depth error) than the rest.
    worse = gt_depth.at[0, :40].set(5.0)
    gm2, n = densify_frame(gm, out, gt_color, worse, jnp.eye(4), cam, mcfg)
    assert int(n) == 100
    # The 40 worst pixels must be among those added: their depth (5.0)
    # appears in the z-derived means.
    z = np.asarray(gm2.means)[: int(n), 2]
    assert (np.isclose(z, 5.0, atol=1e-3)).sum() == 40


def test_budget_off_adds_everything():
    cam, out, gt_color, gt_depth = _setup()
    gm = empty_map(4096)
    mcfg = dataclasses.replace(MappingConfig(), max_adds_per_frame=0)
    gm2, n = densify_frame(gm, out, gt_color, gt_depth, jnp.eye(4), cam, mcfg)
    assert int(n) == 32 * 48


def test_saturated_tiles_excluded():
    cam, out, gt_color, gt_depth = _setup()
    rcfg = RasterConfig(tile=16, tile_h=16)
    # 32x48 -> 2x3 tile grid; mark the top-left tile saturated.
    sat = jnp.zeros(6, bool).at[0].set(True)
    gm = empty_map(4096)
    mcfg = dataclasses.replace(MappingConfig(), max_adds_per_frame=0)
    gm2, n = densify_frame(
        gm, out, gt_color, gt_depth, jnp.eye(4), cam, mcfg,
        sat_tiles=sat, rcfg=rcfg,
    )
    assert int(n) == 32 * 48 - 16 * 16
    # No added mean backprojects into the saturated tile's pixel rect.
    m = np.asarray(gm2.means)[: int(n)]
    u = m[:, 0] / m[:, 2] * cam.fx + cam.cx
    v = m[:, 1] / m[:, 2] * cam.fy + cam.cy
    assert not ((u < 16) & (v < 16)).any()
