"""System-level loop closing: detect -> verify -> correct -> SearchAndFuse
-> global BA -> bin invalidation, on a revisiting trajectory
(``LoopClosing::Run`` ``src/LoopClosing.cc:58-660``).

Poses are INJECTED with synthetic accumulating drift (``gt_pose=`` debug
hook): the run is deterministic and independent of the GS tracker's
convergence on a tiny scene, while still exercising the full loop stack on
real rendered images and real ORB features — BoW retrieval + consistency
streak, SearchByBoW + Sim3 RANSAC + reprojection refinement, essential-graph
correction, map-point fusion, and global BA. The assertion is the honest
outcome: corrected keyframe poses must be closer to ground truth than the
drifted poses the system was fed.
"""

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
    xs += [0.015, 0.0, 0.012, 0.005]  # dwell (jitter keeps KFs coming)
    poses = []
    for i, x in enumerate(xs):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -x  # camera at world x: x_cam = x_world - x
        T[1, 3] = 0.01 * np.sin(i)  # slight jitter
        poses.append(T)
    return poses


def _drift(i: int) -> np.ndarray:
    """World-frame drift at frame i: slow yaw + translation, reaching
    ~0.14 m / ~2.6 deg by the end of the trajectory (odometry-like)."""
    ang = 0.003 * i
    ca, sa = np.cos(ang), np.sin(ang)
    T = np.eye(4, dtype=np.float32)
    T[0, 0], T[0, 2] = ca, sa
    T[2, 0], T[2, 2] = -sa, ca
    T[0, 3] = 0.009 * i
    T[1, 3] = 0.003 * i
    return T


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
            num_iters=8, init_iters=10, max_gaussians=16384,
            window_size=3, covis_window=2,
        ),
        tracking=TrackingConfig(num_iters=4, lost_num_iters=4),
    )
    traj = _out_and_back_trajectory()
    ds = SyntheticDataset(cam, n_splats=3000, seed=5, trajectory=traj)
    rcfg = RasterConfig(
        tile=16, tile_capacity=1024, max_dup=16, chunk=128, dilate_px=8.0
    )
    sys_ = System(cfg, max_keyframes=32, raster=rcfg, frontend="orb",
                  vocabulary=vocab)
    assert sys_.loop_closer is not None
    # Test-scale gap: the journey is ~20 keyframes, not hundreds.
    sys_.loop_closer.min_gap = 8
    sys_.loop_closer.min_inliers = 12
    # Keyframe every frame: the dwell revisit must query the BoW database
    # repeatedly to build the 3-consistent streak within a 16-frame run.
    sys_.max_frames_between_kf = 1

    injected = {}  # frame_id -> drifted T_cw fed to the system
    for i, fr in enumerate(ds):
        T_inj = (fr.gt_T_cw @ np.linalg.inv(_drift(i))).astype(np.float32)
        injected[i] = T_inj
        sys_.track_rgbd(fr.rgb, fr.depth, fr.timestamp, gt_pose=T_inj)

    assert len(sys_.fe.keyframes) >= 10, len(sys_.fe.keyframes)
    assert sys_.loop_events, (
        "loop closing never fired on a revisiting trajectory "
        f"(keyframes={len(sys_.fe.keyframes)})"
    )
    for kf in sys_.fe.keyframes:
        assert np.isfinite(kf.T_cw).all()

    # Honest outcome check: corrected keyframe camera centers must be
    # closer to ground truth than the drift the system was fed, over the
    # late (most-drifted) keyframes.
    gt_by_frame = {i: traj[i] for i in range(len(traj))}
    err_inj, err_corr = [], []
    for kf in sys_.fe.keyframes:
        fid = kf.frame_id
        if fid not in gt_by_frame or fid < len(traj) // 2:
            continue
        c_gt = -gt_by_frame[fid][:3, :3].T @ gt_by_frame[fid][:3, 3]
        c_in = -injected[fid][:3, :3].T @ injected[fid][:3, 3]
        c_co = -np.asarray(kf.T_cw)[:3, :3].T @ np.asarray(kf.T_cw)[:3, 3]
        err_inj.append(np.linalg.norm(c_in - c_gt))
        err_corr.append(np.linalg.norm(c_co - c_gt))
    assert err_corr, "no late keyframes survived"
    assert np.mean(err_corr) < 0.7 * np.mean(err_inj), (
        f"loop correction did not reduce drift: corrected "
        f"{np.mean(err_corr):.4f} vs injected {np.mean(err_inj):.4f}"
    )
