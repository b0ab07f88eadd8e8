"""End-to-end System with the ORB geometric front-end enabled."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import (
    CameraConfig,
    MappingConfig,
    ORBConfig,
    SystemConfig,
    TrackingConfig,
)
from gsorb_slam_tpu.eval.ate import ate_rmse
from gsorb_slam_tpu.raster import RasterConfig
from gsorb_slam_tpu.slam.dataset import SyntheticDataset
from gsorb_slam_tpu.slam.system import System
import pytest

pytestmark = pytest.mark.slow

RCFG = RasterConfig(tile=16, tile_capacity=2048, max_dup=16, chunk=128, dilate_px=8.0)


def test_system_orb_end_to_end():
    cam = Camera(fx=90.0, fy=90.0, cx=48.0, cy=36.0, width=96, height=72)
    cfg = SystemConfig(
        camera=CameraConfig(
            width=96, height=72, fx=90.0, fy=90.0, cx=48.0, cy=36.0, fps=10
        ),
        orb=ORBConfig(n_features=300, n_levels=3),
        mapping=MappingConfig(
            num_iters=20, init_iters=30, max_gaussians=16384,
            window_size=4, covis_window=2,
        ),
        tracking=TrackingConfig(num_iters=25),
    )
    # Sharp speckle texture so FAST finds corners in the renders.
    ds = SyntheticDataset(cam, n_frames=6, n_splats=3000, seed=5, motion_scale=0.1)
    sys_ = System(cfg, max_keyframes=8, raster=RCFG, frontend="orb")
    est, gt = [], []
    for fr in ds:
        T = sys_.track_rgbd(fr.rgb, fr.depth, fr.timestamp)
        est.append(T)
        gt.append(fr.gt_T_cw)
    rmse = ate_rmse(est, gt)
    assert rmse < 0.05, f"ATE {rmse}"
    # The geometric map actually formed.
    assert sys_.fe.n_points > 50
    assert len(sys_.fe.keyframes) >= 1
    s = sys_.shutdown_summary()
    assert s["n_frames"] == 6
