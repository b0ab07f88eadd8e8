"""Triangulation-based map growth + duplicate fusion."""

import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import ORBConfig
from gsorb_slam_tpu.slam.geometric import GeometricFrontend

from tests.test_frontend import make_textured_image


def _fe(cam):
    return GeometricFrontend(
        cam, ORBConfig(n_features=400, n_levels=2), max_points=10000,
        local_ba_every=100,
    )


def test_create_new_map_points_triangulates(rng):
    """Two keyframes of a fronto-parallel textured plane with a known
    baseline: triangulated points must land near the plane depth."""
    cam = Camera(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240)
    fe = _fe(cam)
    img1 = make_textured_image(rng, h=240, w=320)
    z = 2.0
    # Second view: pure x-translation b -> image shifts by fx*b/z pixels.
    b = 0.2
    shift_px = int(round(cam.fx * b / z))
    img2 = np.roll(img1, -shift_px, axis=1)

    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[0, 3] = -b * 1.0  # camera moves +x in world => points shift -x in cam2
    f1 = fe._extract(jnp.asarray(img1))
    f2 = fe._extract(jnp.asarray(img2))
    # Keyframes WITHOUT depth points (empty depth) so triangulation drives.
    kf1 = fe.create_keyframe(f1, np.zeros(img1.shape, np.float32), T1, 0)
    kf2 = fe.create_keyframe(f2, np.zeros(img1.shape, np.float32), T2, 1)
    n = fe.create_new_map_points(kf1, kf2)
    assert n > 30, n
    pts = fe.pt_pos[: fe.n_points]
    good_z = np.abs(pts[:n, 2] - z) < 0.25
    assert good_z.mean() > 0.8, pts[:10, 2]


def test_fuse_duplicates_merges(rng):
    cam = Camera(fx=150.0, fy=150.0, cx=160.0, cy=120.0, width=320, height=240)
    fe = _fe(cam)
    img = make_textured_image(rng, h=240, w=320)
    depth = np.full(img.shape, 2.0, np.float32)
    f1 = fe._extract(jnp.asarray(img))
    kf1 = fe.create_keyframe(f1, depth, np.eye(4, dtype=np.float32), 0)
    n_after_kf1 = fe.n_points
    # Second keyframe of the same view creates DUPLICATE points for the
    # same physical corners (it doesn't know about kf1's).
    f2 = fe._extract(jnp.asarray(img))
    kf2 = fe.create_keyframe(
        f2, depth, np.eye(4, dtype=np.float32), 1, run_local_mapping=False
    )
    assert fe.n_points > n_after_kf1
    n_valid_before = int(fe.pt_valid.sum())
    fused = fe.fuse_duplicates(kf2)
    assert fused > 10, fused
    assert int(fe.pt_valid.sum()) == n_valid_before - fused


def test_map_point_maintenance_normals_and_descriptors(rng):
    """Viewing normals accumulate per observation and the distinctive
    descriptor converges to the min-median-Hamming representative
    (MapPoint::UpdateNormalAndDepth / ComputeDistinctiveDescriptors)."""
    cam = Camera(fx=150.0, fy=150.0, cx=160.0, cy=120.0, width=320, height=240)
    fe = _fe(cam)
    img = make_textured_image(rng, h=240, w=320)
    depth = np.full(img.shape, 2.0, np.float32)
    f1 = fe._extract(jnp.asarray(img))
    kf1 = fe.create_keyframe(f1, depth, np.eye(4, dtype=np.float32), 0)
    pts = kf1.point_ids[kf1.point_ids >= 0]
    assert len(pts) > 10
    # normals point from the camera (origin) toward the points; the z
    # component is cos(view angle) — down to ~0.7 at the image corners
    nz = fe.pt_normal[pts][:, 2]
    assert (nz > 0.6).all()

    # second view from a translated pose: fuse adds observations
    T2 = np.eye(4, dtype=np.float32)
    T2[0, 3] = -0.05
    f2 = fe._extract(jnp.asarray(img))
    kf2 = fe.create_keyframe(
        f2, depth, T2, 1, run_local_mapping=False
    )
    fe.fuse_duplicates(kf2)
    obs_counts = [len(fe.pt_obs_desc.get(int(p), [])) for p in pts]
    assert max(obs_counts) >= 2  # some points gained a second observation

    # distinctive descriptor: inject 3 observations, one being an outlier;
    # the representative must be one of the two agreeing descriptors
    p = int(pts[0])
    base = fe.pt_obs_desc[p][0]
    outlier = ~base
    fe.pt_obs_desc[p] = [base, base.copy(), outlier]
    fe.refresh_descriptors([p])
    assert (fe.pt_desc[p] == base).all()


def test_covisibility_local_map_reacquires_old_region(rng):
    """Pan A -> B -> back to A. Region B holds more points than the
    local-map cap, so a recency-window local map would evict region A's
    points; the covisibility-assembled local map
    (``Tracking::UpdateLocalKeyFrames/UpdateLocalPoints``,
    ``src/Tracking.cc:1572-1716``) must still re-acquire them on return."""
    cam = Camera(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240)
    fe = GeometricFrontend(
        cam, ORBConfig(n_features=400, n_levels=2), max_points=20000,
        local_ba_every=100, local_map_cap=700,
    )
    z = 2.0
    # One long textured wall; camera x-translation t shows a window shifted
    # by fx*t/z pixels.
    n_steps = 8
    step_t = 0.4
    pan_px = int(round(cam.fx * step_t * n_steps / z))
    wall = make_textured_image(rng, h=240, w=320 + pan_px + 10, n_blobs=400)
    depth = np.full((240, 320), z, np.float32)

    def view(t):
        off = int(round(cam.fx * t / z))
        return wall[:, off : off + 320]

    def pose(t):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -t  # x_cam = x_world - t
        return T

    # outbound pan: keyframe at every step (region A = steps 0..1)
    for i in range(n_steps + 1):
        t = i * step_t
        feats = fe._extract(jnp.asarray(view(t)))
        fe.create_keyframe(feats, depth, pose(t), frame_id=i,
                           max_new_points=250)
        res = fe.process_frame(view(t), pose(t), feats=feats)
        assert res.T_orb is not None, f"lost at outbound step {i}"
    region_a_last_point = int(fe.keyframes[1].point_ids.max())
    assert fe.n_points - region_a_last_point > fe.local_map_cap, (
        "test setup: region B must exceed the local-map cap "
        f"({fe.n_points - region_a_last_point} vs {fe.local_map_cap})"
    )

    # return pan: no new keyframes, just tracking
    reacquired = 0
    for i in range(n_steps - 1, -1, -1):
        t = i * step_t
        res = fe.process_frame(view(t), pose(t))
        assert res.T_orb is not None, f"lost at return step {i}"
        if i <= 1:
            old = fe.last_matched_points <= region_a_last_point
            reacquired = max(reacquired, int(old.sum()))
    assert reacquired > 30, (
        f"covisibility local map re-acquired only {reacquired} old points"
    )
