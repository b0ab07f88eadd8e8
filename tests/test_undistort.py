"""Lens undistortion vs OpenCV (the reference delegates to
cv::undistortPoints in Frame::UndistortKeyPoints, src/Frame.cc)."""

import numpy as np
import pytest

from gsorb_slam_tpu.core.camera import (
    Camera,
    Distortion,
    distort_points,
    undistort_points,
    undistorted_image_bounds,
)

# TUM1 calibration (Examples/RGB-D/tum/TUM1.yaml:4-17)
CAM = Camera(fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
             width=640, height=480)
DIST = Distortion(k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628,
                  k3=1.163314)


def _grid_points():
    u = np.linspace(8, 632, 14)
    v = np.linspace(8, 472, 11)
    uu, vv = np.meshgrid(u, v)
    return np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32)


def test_undistort_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    pts = _grid_points()
    K = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1]], np.float64)
    d = np.array([DIST.k1, DIST.k2, DIST.p1, DIST.p2, DIST.k3], np.float64)
    ref = cv2.undistortPoints(pts.reshape(-1, 1, 2).astype(np.float64), K, d, P=K)
    ref = ref.reshape(-1, 2)
    ours = np.asarray(undistort_points(CAM, DIST, pts))
    err = np.linalg.norm(ours - ref, axis=-1)
    assert err.max() < 0.02, f"max undistort error {err.max():.4f}px vs OpenCV"


def test_distort_undistort_roundtrip():
    pts = _grid_points()
    und = np.asarray(undistort_points(CAM, DIST, pts))
    back = np.asarray(distort_points(CAM, DIST, und))
    err = np.linalg.norm(back - pts, axis=-1)
    # OpenCV's 5 fixed-point iterations leave ~0.05px residual at the extreme
    # corners with TUM1's strong k2/k3; interior points are exact.
    assert err.max() < 0.05
    assert np.percentile(err, 95) < 1e-3


def test_distortion_magnitude_significant_on_tum1():
    # The correction this feature adds: multiple pixels at the border.
    pts = np.array([[20.0, 20.0], [620.0, 460.0], [320.0, 240.0]], np.float32)
    und = np.asarray(undistort_points(CAM, DIST, pts))
    shift = np.linalg.norm(und - pts, axis=-1)
    assert shift[0] > 3.0 and shift[1] > 3.0  # corners move > 3px
    assert shift[2] < 0.5  # center nearly fixed


def test_zero_distortion_identity():
    pts = _grid_points()
    zero = Distortion()
    assert zero.is_zero()
    und = np.asarray(undistort_points(CAM, zero, pts))
    np.testing.assert_allclose(und, pts, atol=1e-4)


def test_image_bounds():
    x0, x1, y0, y1 = undistorted_image_bounds(CAM, DIST)
    # TUM1's positive k1 (pincushion) pulls the undistorted corners inward.
    assert 0 < x0 < 30 and 0 < y0 < 30 and 610 < x1 < 640 and 450 < y1 < 480
    z = undistorted_image_bounds(CAM, Distortion())
    assert z == (0.0, 640.0, 0.0, 480.0)


def test_frontend_applies_undistortion():
    """Extraction through GeometricFrontend must produce undistorted uv and
    raw uv_raw differing at the image border."""
    import jax.numpy as jnp

    from gsorb_slam_tpu.slam.geometric import GeometricFrontend

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (480, 640)).astype(np.float32)
    fe = GeometricFrontend(CAM, dist=DIST)
    feats = fe._extract(jnp.asarray(img))
    v = np.asarray(feats.valid)
    uv = np.asarray(feats.uv)[v]
    uv_raw = np.asarray(feats.uv_raw)[v]
    # border keypoints shift by >1px, center ones barely
    r = np.linalg.norm(uv_raw - [CAM.cx, CAM.cy], axis=-1)
    shift = np.linalg.norm(uv - uv_raw, axis=-1)
    if (r > 250).any():
        assert shift[r > 250].max() > 1.0
    expected = np.asarray(undistort_points(CAM, DIST, uv_raw))
    np.testing.assert_allclose(uv, expected, atol=1e-3)
