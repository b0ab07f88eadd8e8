"""Monocular (7-DoF) loop closure: injected scale drift must be removed by
the Sim3 essential graph (VERDICT r3 item 5; ``src/Optimizer.cc:782-1045``
+ ``src/LoopClosing.cc:234`` mbFixScale=false for mono)."""

from types import SimpleNamespace

import numpy as np

from gsorb_slam_tpu.frontend.sim3 import horn_alignment
from gsorb_slam_tpu.slam.loop import LoopCloser, _sim3_from_mat, _sim3_mat

import jax.numpy as jnp


def _circle_pose(theta: float, radius: float) -> np.ndarray:
    """Camera on a circle in the XZ plane looking at the center."""
    c, s = np.cos(theta), np.sin(theta)
    T_wc = np.eye(4, dtype=np.float32)
    # camera z-axis points toward the center
    fwd = np.array([-c, 0.0, -s])
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    T_wc[:3, 0] = right / np.linalg.norm(right)
    T_wc[:3, 1] = up
    T_wc[:3, 2] = fwd
    T_wc[:3, 3] = [radius * c, 0.0, radius * s]
    return np.linalg.inv(T_wc).astype(np.float32)


def test_sim3_loop_removes_scale_drift():
    rng = np.random.default_rng(0)
    K = 12
    gamma = 1.04  # per-step multiplicative scale drift (mono odometry)
    thetas = np.linspace(0, 2 * np.pi * (K - 1) / K, K)
    T_true = [_circle_pose(th, radius=3.0) for th in thetas]

    # Drifted odometry: each relative translation scaled by the cumulative
    # drift factor at that step.
    T_drift = [T_true[0].copy()]
    lam = 1.0
    for k in range(1, K):
        rel = T_true[k] @ np.linalg.inv(T_true[k - 1])
        lam *= gamma
        rel_d = rel.copy()
        rel_d[:3, 3] = rel[:3, 3] * lam
        T_drift.append((rel_d @ T_drift[-1]).astype(np.float32))
    lam_final = gamma ** (K - 1)

    # Shared scene points near the loop site (visible from both ends).
    X_true = rng.uniform(-1.0, 1.0, (60, 3)).astype(np.float32)
    # Query-side (drifted) coordinates: triangulated depth is scaled by the
    # accumulated drift at the query, expressed in the drifted world.
    q = K - 1
    Xc = X_true @ T_true[q][:3, :3].T + T_true[q][:3, 3]
    Ti = np.linalg.inv(T_drift[q])
    X_query = (lam_final * Xc) @ Ti[:3, :3].T + Ti[:3, 3]

    # Verified correction: x_match(=true) = s R x_query + t.
    s, R, t = horn_alignment(
        jnp.asarray(X_query), jnp.asarray(X_true), fix_scale=False
    )
    s, R, t = float(s), np.asarray(R), np.asarray(t)
    assert abs(s - 1.0 / lam_final) < 0.05 * (1.0 / lam_final)
    T_corr = _sim3_mat((s, R, t))

    kfs = [
        SimpleNamespace(kf_id=k, T_cw=T_drift[k].copy(), parent_id=k - 1)
        for k in range(K)
    ]
    lc = LoopCloser.__new__(LoopCloser)  # correct() needs no vocabulary
    lc.fix_scale = False
    corrected, point_corr = lc.correct(kfs, query_kf_id=q, match_kf_id=0,
                                       T_corr=T_corr, covis_edges=[])
    assert point_corr is not None

    # Scale restored: relative translation magnitudes match ground truth.
    def rel_norms(poses):
        return np.array([
            np.linalg.norm(
                (poses[k] @ np.linalg.inv(poses[k - 1]))[:3, 3]
            )
            for k in range(1, K)
        ])

    gt = rel_norms(T_true)
    before = rel_norms(T_drift)
    after = rel_norms([corrected[k] for k in range(K)])
    drift_before = float(np.abs(before / gt - 1.0).max())
    drift_after = float(np.abs(after / gt - 1.0).max())
    assert drift_before > 0.3  # the injected drift was substantial
    assert drift_after < 0.25 * drift_before, (drift_before, drift_after)

    # The query-side point remap restores metric structure.
    M = point_corr[q]
    X_fixed = X_query @ M[:3, :3].T + M[:3, 3]
    # Compare pairwise scale (gauge-free): ratio of RMS spreads.
    spread = lambda X: np.sqrt(((X - X.mean(0)) ** 2).sum(1)).mean()
    ratio_before = spread(X_query) / spread(X_true)
    ratio_after = spread(X_fixed) / spread(X_true)
    assert abs(ratio_before - 1.0) > 0.3
    assert abs(ratio_after - 1.0) < 0.1, (ratio_before, ratio_after)


def test_sim3_graph_no_scale_noop_matches_se3_path():
    """With fix_scale=True (RGB-D) the correction path is unchanged: the
    SE3 graph runs and no point transform is returned."""
    K = 6
    thetas = np.linspace(0, np.pi, K)
    T_true = [_circle_pose(th, radius=2.0) for th in thetas]
    kfs = [
        SimpleNamespace(kf_id=k, T_cw=T_true[k].copy(), parent_id=k - 1)
        for k in range(K)
    ]
    lc = LoopCloser.__new__(LoopCloser)
    lc.fix_scale = True
    T_corr = np.eye(4, dtype=np.float32)
    corrected, point_corr = lc.correct(kfs, query_kf_id=K - 1, match_kf_id=0,
                                       T_corr=T_corr, covis_edges=[])
    assert point_corr is None
    for k in range(K):
        np.testing.assert_allclose(corrected[k], T_true[k], atol=2e-3)


def test_sim3_mat_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    s, t = 1.7, np.array([0.3, -0.2, 0.9], np.float32)
    s2, R2, t2 = _sim3_from_mat(_sim3_mat((s, R, t)))
    assert abs(s2 - s) < 1e-5
    np.testing.assert_allclose(R2, R, atol=1e-5)
    np.testing.assert_allclose(t2, t, atol=1e-6)
