"""Failure recovery: relocalization + keyframe culling."""

import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import ORBConfig
from gsorb_slam_tpu.slam.geometric import GeometricFrontend

from tests.test_frontend import make_textured_image


def test_relocalize_recovers_pose(rng):
    """Build a keyframe at identity, then relocalize the SAME image from
    scratch (simulating total tracking loss): pose must come back ~identity."""
    cam = Camera(fx=150.0, fy=150.0, cx=160.0, cy=120.0, width=320, height=240)
    fe = GeometricFrontend(cam, ORBConfig(n_features=400, n_levels=3), max_points=10000)
    img = make_textured_image(rng, h=240, w=320)
    depth = np.full(img.shape, 2.5, np.float32)
    feats = fe._extract(jnp.asarray(img))
    fe.create_keyframe(feats, depth, np.eye(4, dtype=np.float32), frame_id=0)
    assert fe.n_points > 80

    # "Lost" frame: same scene, no prior pose.
    feats2 = fe._extract(jnp.asarray(img))
    T = fe.relocalize(feats2)
    assert T is not None
    assert np.linalg.norm(T[:3, 3]) < 0.05
    assert np.linalg.norm(T[:3, :3] - np.eye(3)) < 0.05


def test_cull_keyframes_removes_redundant(rng):
    cam = Camera(fx=150.0, fy=150.0, cx=160.0, cy=120.0, width=320, height=240)
    fe = GeometricFrontend(
        cam, ORBConfig(n_features=300, n_levels=2), max_points=10000,
        local_ba_every=100,
    )
    img = make_textured_image(rng, h=240, w=320)
    depth = np.full(img.shape, 2.0, np.float32)
    feats = fe._extract(jnp.asarray(img))
    # Five keyframes of the same view: all but the protected ones observe
    # identical points (after the first, create_keyframe re-creates points
    # for unmatched keypoints — force sharing by reusing point_ids).
    kf0 = fe.create_keyframe(feats, depth, np.eye(4, dtype=np.float32), 0)
    for i in range(1, 5):
        kf = fe.create_keyframe(
            feats, depth, np.eye(4, dtype=np.float32), i, run_local_mapping=False
        )
        kf.point_ids = kf0.point_ids.copy()
        for p in kf.point_ids[kf.point_ids >= 0]:
            fe._observe_kf(int(p), kf.kf_id)
    n_before = len(fe.keyframes)
    culled = fe.cull_keyframes()
    assert len(culled) >= 1
    assert len(fe.keyframes) == n_before - len(culled)
