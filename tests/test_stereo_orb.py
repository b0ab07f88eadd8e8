"""ORB stereo matching + stereo BA edges (Frame::ComputeStereoMatches,
src/Frame.cc; EdgeStereoSE3ProjectXYZOnlyPose, src/Optimizer.cc:300-380)."""

import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.frontend.ba import pose_optimization
from gsorb_slam_tpu.frontend.matcher import compute_stereo_matches
from gsorb_slam_tpu.frontend.orb import ORBFeatures

CAM = Camera(fx=200.0, fy=200.0, cx=80.0, cy=60.0, width=160, height=120)
BF = 200.0 * 0.08  # 8cm baseline


def _feats(uv, desc, octave=None, n_pad=8):
    n = len(uv)
    N = n + n_pad
    uv_p = np.zeros((N, 2), np.float32)
    uv_p[:n] = uv
    d = np.zeros((N, 8), np.uint32)
    d[:n] = desc
    oct_ = np.zeros(N, np.int32)
    if octave is not None:
        oct_[:n] = octave
    v = np.zeros(N, bool)
    v[:n] = True
    return ORBFeatures(
        uv=jnp.asarray(uv_p),
        response=jnp.ones(N, jnp.float32),
        angle=jnp.zeros(N, jnp.float32),
        octave=jnp.asarray(oct_),
        descriptors=jnp.asarray(d),
        valid=jnp.asarray(v),
        uv_raw=jnp.asarray(uv_p),
    )


def test_compute_stereo_matches_recovers_depth():
    rng = np.random.default_rng(3)
    n = 60
    z = rng.uniform(0.8, 4.0, n).astype(np.float32)
    uL = rng.uniform(30, 150, n).astype(np.float32)
    vL = rng.uniform(5, 115, n).astype(np.float32)
    disp = BF / z
    uR = uL - disp
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    fL = _feats(np.stack([uL, vL], -1), desc)
    fR = _feats(np.stack([uR, vL], -1), desc)
    sm = compute_stereo_matches(
        fL, fR, BF, min_z=0.3, scale_factors=jnp.asarray([1.0, 1.2, 1.44])
    )
    valid = np.asarray(sm.valid)[:n]
    assert valid.mean() > 0.9
    err = np.abs(np.asarray(sm.depth)[:n][valid] - z[valid])
    assert np.max(err) < 1e-2


def test_stereo_matches_reject_wrong_row():
    rng = np.random.default_rng(4)
    n = 30
    uL = rng.uniform(40, 140, n).astype(np.float32)
    vL = rng.uniform(10, 50, n).astype(np.float32)
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    fL = _feats(np.stack([uL, vL], -1), desc)
    # right features on rows 40px away -> outside the band, no matches
    fR = _feats(np.stack([uL - 5.0, vL + 40.0], -1), desc)
    sm = compute_stereo_matches(
        fL, fR, BF, min_z=0.3, scale_factors=jnp.asarray([1.0, 1.2, 1.44])
    )
    assert np.asarray(sm.valid)[:n].sum() == 0


def test_pose_optimization_stereo_edges_converge():
    rng = np.random.default_rng(5)
    n = 40
    world = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n), rng.uniform(1.5, 4, n)], -1
    ).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.03, -0.02, 0.05]
    xc = world @ T_gt[:3, :3].T + T_gt[:3, 3]
    u = CAM.fx * xc[:, 0] / xc[:, 2] + CAM.cx
    v = CAM.fy * xc[:, 1] / xc[:, 2] + CAM.cy
    ur = u - BF / xc[:, 2]
    obs = np.stack([u, v], -1).astype(np.float32)
    # every other observation stereo, rest mono
    obs_ur = np.where(np.arange(n) % 2 == 0, ur, -1.0).astype(np.float32)

    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0.0, 0.0, 0.0]
    res = pose_optimization(
        jnp.asarray(T0), jnp.asarray(world), jnp.asarray(obs),
        jnp.ones(n, jnp.float32), jnp.ones(n, bool), CAM,
        obs_ur=jnp.asarray(obs_ur), bf=BF,
    )
    T_est = np.asarray(res.T_cw)
    assert np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]) < 1e-3
    assert int(res.n_inliers) == n


def test_pose_optimization_mono_unchanged():
    """obs_ur=None keeps the original mono behavior."""
    rng = np.random.default_rng(6)
    n = 30
    world = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n), rng.uniform(1.5, 4, n)], -1
    ).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.02, 0.01, -0.03]
    xc = world @ T_gt[:3, :3].T + T_gt[:3, 3]
    u = CAM.fx * xc[:, 0] / xc[:, 2] + CAM.cx
    v = CAM.fy * xc[:, 1] / xc[:, 2] + CAM.cy
    obs = np.stack([u, v], -1).astype(np.float32)
    res = pose_optimization(
        jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(world),
        jnp.asarray(obs), jnp.ones(n, jnp.float32), jnp.ones(n, bool), CAM,
    )
    assert np.linalg.norm(np.asarray(res.T_cw)[:3, 3] - T_gt[:3, 3]) < 1e-3
