"""KNN scale init + drawing utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsorb_slam_tpu.ops.knn import knn3_mean_sq_dist
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map
from gsorb_slam_tpu.utils.drawing import camera_centers, draw_keypoints, draw_map_topdown


def test_knn3_regular_grid(rng):
    """On a regular grid with spacing s the 3-NN are at distance s."""
    s = 0.5
    xs, ys, zs = np.meshgrid(np.arange(6), np.arange(6), np.arange(6))
    pts = (np.stack([xs, ys, zs], -1).reshape(-1, 3) * s).astype(np.float32)
    d2 = np.asarray(knn3_mean_sq_dist(jnp.asarray(pts), jnp.ones(len(pts), bool)))
    # interior points: all 3 NN at exactly s
    interior = np.all((pts > 0.4) & (pts < 2.4), axis=1)
    np.testing.assert_allclose(d2[interior], s * s, rtol=1e-4)


def test_knn3_respects_validity(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    valid = np.ones(100, bool)
    valid[50:] = False
    d2 = np.asarray(knn3_mean_sq_dist(jnp.asarray(pts), jnp.asarray(valid)))
    assert np.all(d2[50:] == 0)
    assert np.all(d2[:50] > 0)


def test_add_points_knn_scale_methods(rng):
    """initScalarMethod 0/1: scale from 3-NN distance (src/Gaussian.cc:59-72)."""
    gm = empty_map(256)
    s = 0.3
    xs, ys, zs = np.meshgrid(np.arange(5), np.arange(5), np.arange(5))
    means = (np.stack([xs, ys, zs], -1).reshape(-1, 3) * s).astype(np.float32)
    rgb = rng.uniform(size=(125, 3)).astype(np.float32)
    gm = add_points(
        gm, jnp.asarray(means), jnp.asarray(rgb), jnp.asarray(means[:, 2] + 1.0),
        jnp.ones(125, bool), 500.0, 500.0, init_scalar_method=0,
    )
    scales = np.exp(np.asarray(gm.log_scales[:125, 0]))
    interior = np.all((means > 0.2) & (means < 1.0), axis=1)
    np.testing.assert_allclose(scales[interior], s, rtol=1e-3)


def test_draw_keypoints_and_map(rng):
    img = rng.uniform(size=(48, 64, 3)).astype(np.float32)
    uv = rng.uniform([4, 4], [60, 44], size=(20, 2)).astype(np.float32)
    out = draw_keypoints(img, uv, matched=np.arange(20) % 2 == 0)
    assert out.shape == (48, 64, 3) and out.dtype == np.uint8
    assert not np.array_equal(out, (img * 255).astype(np.uint8))

    means = rng.normal(size=(500, 3)).astype(np.float32)
    Ts = [np.eye(4, dtype=np.float32) for _ in range(5)]
    for i, T in enumerate(Ts):
        T[:3, 3] = [0.1 * i, 0, 0]
    top = draw_map_topdown(
        means, kf_positions=camera_centers(Ts), trajectory=camera_centers(Ts)
    )
    assert top.shape == (512, 512, 3)
    assert (top != 15).any()
