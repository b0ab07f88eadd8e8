"""Monocular initializer + PnP relocalization."""

import numpy as np
import pytest

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.frontend.initializer import initialize_monocular
from gsorb_slam_tpu.frontend.pnp import ransac_pnp


def _project(K, T, X):
    xc = X @ T[:3, :3].T + T[:3, 3]
    uvw = xc @ K.T
    return uvw[:, :2] / uvw[:, 2:3], xc[:, 2]


def test_initialize_monocular_translation(rng):
    """General 3D scene + translation -> fundamental-matrix path recovers
    the motion direction and triangulates in front of both cameras."""
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
    N = 200
    X = np.stack(
        [rng.uniform(-1, 1, N), rng.uniform(-0.8, 0.8, N), rng.uniform(2, 6, N)], -1
    ).astype(np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, 3] = [0.3, 0.05, 0.02]
    ang = 0.05
    T2[:3, :3] = np.array(
        [
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ],
        np.float32,
    )
    uv1, z1 = _project(K, np.eye(4, dtype=np.float32), X)
    uv2, z2 = _project(K, T2, X)
    uv1 = uv1 + rng.normal(0, 0.3, uv1.shape)
    uv2 = uv2 + rng.normal(0, 0.3, uv2.shape)

    res = initialize_monocular(
        uv1.astype(np.float32), uv2.astype(np.float32), K, seed=1
    )
    assert res is not None
    assert res.inliers.sum() > 100
    # Monocular scale is free: compare translation DIRECTION.
    t_est = res.T_cw2[:3, 3]
    t_gt = T2[:3, 3]
    cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
    assert cos > 0.95, cos
    # Rotation is scale-free: compare directly.
    np.testing.assert_allclose(res.T_cw2[:3, :3], T2[:3, :3], atol=0.05)
    # Triangulated structure matches GT up to the global scale.
    good = res.inliers
    scale = np.median(X[good, 2]) / np.median(res.points[good, 2])
    err = np.linalg.norm(res.points[good] * scale - X[good], axis=1)
    assert np.median(err) < 0.4  # pre-BA triangulation quality; full BA refines


def test_initialize_monocular_rejects_degenerate(rng):
    """Too few matches -> None."""
    K = np.eye(3, dtype=np.float32)
    uv = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    assert initialize_monocular(uv, uv, K) is None


def test_ransac_pnp_with_outliers(rng):
    cam = Camera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)
    K = np.asarray(cam.K)
    N = 150
    X = np.stack(
        [rng.uniform(-1, 1, N), rng.uniform(-0.8, 0.8, N), rng.uniform(2, 5, N)], -1
    ).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.2, -0.1, 0.15]
    ang = 0.1
    T_gt[:3, :3] = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    uv, _ = _project(K, T_gt, X)
    uv = uv + rng.normal(0, 0.3, uv.shape)
    uv[:40] += rng.uniform(30, 80, (40, 2))  # 27% outliers
    res = ransac_pnp(X, uv.astype(np.float32), np.ones(N, bool), cam, seed=2)
    assert res is not None
    assert res.n_inliers > 90
    assert np.linalg.norm(res.T_cw[:3, 3] - T_gt[:3, 3]) < 0.01
    assert res.inliers[:40].sum() < 5
