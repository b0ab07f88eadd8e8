"""System-level loop closing: detect -> verify -> correct -> SearchAndFuse
-> global BA -> bin invalidation, on a revisiting trajectory
(``LoopClosing::Run`` ``src/LoopClosing.cc:58-660``)."""

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
from gsorb_slam_tpu.eval.ate import ate_rmse
from gsorb_slam_tpu.frontend.vocab import default_vocabulary
from gsorb_slam_tpu.raster import RasterConfig
from gsorb_slam_tpu.slam.dataset import SyntheticDataset
from gsorb_slam_tpu.slam.system import System

pytestmark = pytest.mark.slow


def _out_and_back_trajectory():
    """Pan out along +x, come back, then dwell at the start: the dwell
    keyframes must retrieve the early keyframes from the BoW database and
    build the 3-consistent streak."""
    xs = []
    xs += list(np.arange(0.0, 1.6, 0.2))  # 8 outbound
    xs += [1.1, 0.7, 0.35, 0.1]  # coarse return
    xs += [0.015, 0.0, 0.012]  # dwell (jitter keeps KFs coming)
    poses = []
    for i, x in enumerate(xs):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -x  # camera at world x: x_cam = x_world - x
        T[1, 3] = 0.01 * np.sin(i)  # slight jitter
        poses.append(T)
    return poses


def test_loop_closes_on_revisit():
    vocab = default_vocabulary()
    assert vocab is not None, "packaged vocabulary artifact missing"

    cam = Camera(fx=90.0, fy=90.0, cx=48.0, cy=36.0, width=96, height=72)
    cfg = SystemConfig(
        camera=CameraConfig(
            width=96, height=72, fx=90.0, fy=90.0, cx=48.0, cy=36.0, fps=10
        ),
        orb=ORBConfig(n_features=300, n_levels=3),
        mapping=MappingConfig(
            num_iters=10, init_iters=15, max_gaussians=16384,
            window_size=3, covis_window=2,
        ),
        tracking=TrackingConfig(num_iters=15),
    )
    traj = _out_and_back_trajectory()
    ds = SyntheticDataset(
        cam, n_splats=3000, seed=5, trajectory=traj
    )
    rcfg = RasterConfig(
        tile=16, tile_capacity=1024, max_dup=16, chunk=128, dilate_px=8.0
    )
    sys_ = System(cfg, max_keyframes=32, raster=rcfg, frontend="orb",
                  vocabulary=vocab)
    assert sys_.loop_closer is not None
    # Test-scale gap: the journey is ~20 keyframes, not hundreds.
    sys_.loop_closer.min_gap = 8
    sys_.loop_closer.min_inliers = 12

    est, gt = [], []
    for fr in ds:
        T = sys_.track_rgbd(fr.rgb, fr.depth, fr.timestamp)
        est.append(T)
        gt.append(fr.gt_T_cw)

    assert len(sys_.fe.keyframes) >= 10, len(sys_.fe.keyframes)
    assert sys_.loop_events, (
        "loop closing never fired on a revisiting trajectory "
        f"(keyframes={len(sys_.fe.keyframes)})"
    )
    # Corrected poses stay finite and the trajectory remains accurate.
    for kf in sys_.fe.keyframes:
        assert np.isfinite(kf.T_cw).all()
    rmse = ate_rmse(est, gt)
    assert rmse < 0.08, f"ATE after loop closing: {rmse}"
