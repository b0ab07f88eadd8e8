"""Checkpoint/resume: a capability the reference leaves as TODO stubs."""

import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import (
    CameraConfig,
    MappingConfig,
    SystemConfig,
    TrackingConfig,
)
from gsorb_slam_tpu.raster import RasterConfig
from gsorb_slam_tpu.slam.dataset import SyntheticDataset
from gsorb_slam_tpu.slam.system import System
import pytest

pytestmark = pytest.mark.slow

RCFG = RasterConfig(tile=16, tile_capacity=2048, max_dup=16, chunk=128, dilate_px=8.0)


def _cfg():
    return SystemConfig(
        camera=CameraConfig(width=64, height=48, fx=60.0, fy=60.0, cx=32.0, cy=24.0, fps=10),
        mapping=MappingConfig(
            num_iters=15, init_iters=25, max_gaussians=16384, window_size=4, covis_window=2
        ),
        tracking=TrackingConfig(num_iters=20),
    )


def test_checkpoint_resume_continues_tracking(tmp_path):
    cam = Camera(fx=60.0, fy=60.0, cx=32.0, cy=24.0, width=64, height=48)
    ds = SyntheticDataset(cam, n_frames=6, n_splats=1500, seed=3, motion_scale=0.12)

    sys_a = System(_cfg(), max_keyframes=8, raster=RCFG, seed=0)
    for i in range(3):
        sys_a.track_rgbd(ds[i].rgb, ds[i].depth, float(i))
    ckpt = str(tmp_path / "ckpt")
    sys_a.save_checkpoint(ckpt)

    # Resume in a FRESH System and keep tracking.
    sys_b = System(_cfg(), max_keyframes=8, raster=RCFG, seed=0)
    sys_b.load_checkpoint(ckpt)
    assert sys_b.frame_id == 3
    assert int(sys_b.gm.n_active()) == int(sys_a.gm.n_active())
    np.testing.assert_allclose(
        np.asarray(sys_b.gm.means), np.asarray(sys_a.gm.means)
    )
    np.testing.assert_allclose(
        np.asarray(sys_b.gm.adam_m["means"]), np.asarray(sys_a.gm.adam_m["means"])
    )
    for i in range(3, 6):
        T = sys_b.track_rgbd(ds[i].rgb, ds[i].depth, float(i))
        err = np.linalg.norm(T[:3, 3] - ds[i].gt_T_cw[:3, 3])
        assert err < 0.1, err
    assert len(sys_b.trajectory) == 6


def test_reset_clears_session_and_tracks_again():
    """System::Reset parity (src/System.cc): after reset() the session state
    is empty and tracking restarts cleanly on the SAME compiled programs."""
    cam = Camera(fx=60.0, fy=60.0, cx=32.0, cy=24.0, width=64, height=48)
    ds = SyntheticDataset(cam, n_frames=6, n_splats=1500, seed=3, motion_scale=0.12)

    s = System(_cfg(), max_keyframes=8, raster=RCFG, seed=0)
    for i in range(3):
        s.track_rgbd(ds[i].rgb, ds[i].depth, float(i))
    assert s.frame_id == 3 and len(s.keyframes) >= 1
    assert int(s.gm.count) > 0

    s.reset()
    assert s.frame_id == 0
    assert s.keyframes == [] and s.last_kf is None
    assert s.trajectory == [] and s.loop_events == []
    assert int(s.gm.count) == 0
    np.testing.assert_array_equal(s.velocity, np.eye(4, dtype=np.float32))

    # A fresh session on the same System instance.
    for i in range(3):
        T = s.track_rgbd(ds[i].rgb, ds[i].depth, float(i))
    assert s.frame_id == 3 and np.all(np.isfinite(T))
