"""Stereo and monocular System entry points."""

import numpy as np
import pytest

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import (
    CameraConfig,
    MappingConfig,
    ORBConfig,
    SystemConfig,
    TrackingConfig,
)
from gsorb_slam_tpu.raster import RasterConfig
from gsorb_slam_tpu.slam.dataset import SyntheticDataset
from gsorb_slam_tpu.slam.system import System

pytestmark = pytest.mark.slow

RCFG = RasterConfig(tile=16, tile_capacity=2048, max_dup=16, chunk=128, dilate_px=8.0)


def _cfg(w=96, h=72, f=90.0):
    return SystemConfig(
        camera=CameraConfig(width=w, height=h, fx=f, fy=f, cx=w / 2, cy=h / 2, fps=10, bf=f * 0.1),
        orb=ORBConfig(n_features=400, n_levels=3),
        mapping=MappingConfig(
            num_iters=15, init_iters=25, max_gaussians=16384, window_size=4, covis_window=2
        ),
        tracking=TrackingConfig(num_iters=20),
    )


def test_track_monocular_initializes_and_tracks():
    cfg = _cfg(w=160, h=120, f=130.0)
    cam = Camera(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
    # Sharp mid-scale splats give the FAST detector stable, matchable corners;
    # moderate motion provides bootstrap parallax.
    ds = SyntheticDataset(
        cam, n_frames=8, n_splats=6000, seed=7, motion_scale=0.35,
        scale_range=(0.02, 0.05),
    )
    sys_ = System(
        cfg, max_keyframes=8, raster=RCFG, frontend="orb",
        mono_min_matches=40, mono_min_inliers=30,
    )
    results = [sys_.track_monocular(ds[i].rgb, float(i)) for i in range(len(ds))]
    initialized = [r is not None for r in results]
    assert any(initialized), "monocular bootstrap never succeeded"
    # After initialization every frame returns a pose.
    first = initialized.index(True)
    assert all(initialized[first:])
    assert sys_.fe.n_points > 25  # triangulated structure entered the map
    assert int(sys_.gm.n_active()) > 25  # splat map seeded from it


def test_track_stereo_produces_depth_and_tracks():
    cv2 = pytest.importorskip("cv2")
    cfg = _cfg(w=128, h=96, f=100.0)
    cam = Camera(fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=128, height=96)
    ds = SyntheticDataset(cam, n_frames=2, n_splats=3000, seed=2, motion_scale=0.05)
    sys_ = System(cfg, max_keyframes=8, raster=RCFG)

    # Fabricate a rectified right view by horizontal disparity shift
    # d = bf / z of the rendered depth.
    for i in range(2):
        fr = ds[i]
        bf = cfg.camera.bf
        disp = np.where(fr.depth > 0, bf / np.maximum(fr.depth, 0.1), 0.0)
        xs = np.arange(fr.rgb.shape[1])[None, :, None]
        right = np.zeros_like(fr.rgb)
        src_x = (np.arange(fr.rgb.shape[1])[None, :] - disp).astype(int)
        valid = (src_x >= 0) & (fr.depth > 0)
        for y in range(fr.rgb.shape[0]):
            right[y, valid[y]] = fr.rgb[y, np.clip(src_x[y][valid[y]], 0, None)]
        T = sys_.track_stereo(fr.rgb, right, float(i))
        assert T.shape == (4, 4)
    assert int(sys_.gm.n_active()) > 100


def test_track_monocular_lost_then_relocalizes():
    """Mid-sequence blackout breaks tracking (LOST state); on return the
    camera JUMPS back to an earlier viewpoint, so the motion model is wrong
    and only relocalization can recover (``Tracking::Relocalization`` via
    the classic ``Track()`` state machine, ``src/Tracking.cc:699-738,1718``)."""
    cfg = _cfg(w=160, h=120, f=130.0)
    cam = Camera(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
    ds = SyntheticDataset(
        cam, n_frames=10, n_splats=6000, seed=7, motion_scale=0.35,
        scale_range=(0.02, 0.05),
    )
    sys_ = System(
        cfg, max_keyframes=16, raster=RCFG, frontend="orb",
        mono_min_matches=40, mono_min_inliers=30,
    )
    results = []
    for i in range(len(ds)):
        results.append(sys_.track_monocular(ds[i].rgb, float(i)))
    assert any(r is not None for r in results), "bootstrap failed"
    assert len(sys_.fe.keyframes) >= 2
    assert sys_._mono_state == "OK"

    # blackout: featureless frames -> LOST
    blank = np.zeros_like(ds[0].rgb)
    for j in range(2):
        sys_.track_monocular(blank, float(len(ds) + j))
    assert sys_._mono_state == "LOST"

    # jump back to an early viewpoint: motion model is useless now.
    # Monocular scale is arbitrary, so compare against the system's OWN
    # first-pass estimate of the same image, not metric GT.
    recovered = False
    for k in range(2, 5):
        T = sys_.track_monocular(ds[k].rgb, float(len(ds) + 2 + k))
        if sys_._mono_state == "OK" and T is not None and results[k] is not None:
            ref = results[k]
            err = np.linalg.norm(T[:3, 3] - ref[:3, 3])
            scale = max(np.linalg.norm(ref[:3, 3]), 0.2)
            assert err < 0.5 * scale, (err, scale)
            recovered = True
            break
    assert recovered, "never relocalized after blackout"


def test_track_monocular_early_lost_auto_resets():
    """Losing tracking with a young map (<=5 KFs) must auto-Reset and
    re-enter initialization (``src/Tracking.cc:699-707``)."""
    cfg = _cfg(w=160, h=120, f=130.0)
    cam = Camera(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
    ds = SyntheticDataset(
        cam, n_frames=4, n_splats=6000, seed=7, motion_scale=0.35,
        scale_range=(0.02, 0.05),
    )
    sys_ = System(
        cfg, max_keyframes=16, raster=RCFG, frontend="orb",
        mono_min_matches=40, mono_min_inliers=30,
    )
    for i in range(len(ds)):
        sys_.track_monocular(ds[i].rgb, float(i))
    if not sys_._mono_initialized:
        pytest.skip("bootstrap did not converge on this short sequence")
    blank = np.zeros_like(ds[0].rgb)
    for j in range(4):
        sys_.track_monocular(blank, float(len(ds) + j))
    assert not sys_._mono_initialized, "auto-Reset did not fire"
    assert sys_._mono_state == "NOT_INITIALIZED"
    # and the system can bootstrap again
    for i in range(len(ds)):
        sys_.track_monocular(ds[i].rgb, float(10 + i))
    assert sys_._mono_initialized or sys_._mono_ref is not None
