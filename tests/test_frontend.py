import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import ORBConfig
from gsorb_slam_tpu.core.transforms import se3_exp
from gsorb_slam_tpu.frontend import ba
from gsorb_slam_tpu.frontend.matcher import (
    hamming_matrix,
    match_descriptors,
    search_by_projection,
)
from gsorb_slam_tpu.frontend.orb import ORBFeatures, extract_orb


def make_textured_image(rng, h=240, w=320, n_blobs=120):
    """Random bright rectangles on dark background: lots of corners."""
    img = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        y = rng.integers(25, h - 40)
        x = rng.integers(25, w - 40)
        bh = rng.integers(6, 18)
        bw = rng.integers(6, 18)
        img[y : y + bh, x : x + bw] = rng.uniform(0.4, 1.0)
    return img


def test_extract_orb_finds_corners(rng):
    img = make_textured_image(rng)
    feats = extract_orb(jnp.asarray(img), ORBConfig(n_features=500))
    n = int(feats.count())
    assert n > 200, n
    v = np.asarray(feats.valid)
    uv = np.asarray(feats.uv)[v]
    octave = np.asarray(feats.octave)[v]
    # Keypoints must sit on texture (gradient), not flat areas. Coarse
    # pyramid levels carry up to ~2px level-0 quantization, so gate fine
    # levels strictly and all levels loosely.
    from scipy.ndimage import maximum_filter

    gy, gx = np.gradient(img)
    gmax = maximum_filter(np.hypot(gx, gy), 5)
    at_kp = gmax[
        np.clip(uv[:, 1].astype(int), 0, img.shape[0] - 1),
        np.clip(uv[:, 0].astype(int), 0, img.shape[1] - 1),
    ]
    fine = octave <= 2
    assert np.mean(at_kp[fine] > 0.05) > 0.95
    assert np.mean(at_kp > 0.05) > 0.8


def test_descriptors_distinct(rng):
    img = make_textured_image(rng)
    feats = extract_orb(jnp.asarray(img), ORBConfig(n_features=300))
    v = np.asarray(feats.valid)
    d = np.asarray(feats.descriptors)[v]
    D = np.array(hamming_matrix(jnp.asarray(d), jnp.asarray(d)))
    np.fill_diagonal(D, 999)
    # Different corners should rarely collide (Hamming >> 0).
    assert np.median(D) > 60


def test_matching_under_translation(rng):
    img = make_textured_image(rng)
    shift = 7
    img2 = np.roll(img, shift, axis=1)
    f1 = extract_orb(jnp.asarray(img), ORBConfig(n_features=400))
    f2 = extract_orb(jnp.asarray(img2), ORBConfig(n_features=400))
    m = match_descriptors(f1, f2)
    v = np.asarray(m.valid)
    assert v.sum() > 50, v.sum()
    uv1 = np.asarray(f1.uv)[v]
    uv2 = np.asarray(f2.uv)[np.asarray(m.idx2)[v]]
    d = uv2 - uv1
    good = (np.abs(d[:, 0] - shift) < 2.0) & (np.abs(d[:, 1]) < 2.0)
    assert np.mean(good) > 0.8, np.mean(good)


def test_search_by_projection(rng):
    cam = Camera(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240)
    img = make_textured_image(rng)
    feats = extract_orb(jnp.asarray(img), ORBConfig(n_features=400))
    v = np.asarray(feats.valid)
    uv = np.asarray(feats.uv)
    # Fabricate map points that project exactly onto the keypoints.
    z = rng.uniform(1.0, 3.0, size=len(uv)).astype(np.float32)
    world = np.stack(
        [(uv[:, 0] - cam.cx) * z / cam.fx, (uv[:, 1] - cam.cy) * z / cam.fy, z], -1
    )
    m = search_by_projection(
        jnp.asarray(world), feats.descriptors, feats.valid, feats,
        jnp.eye(4), cam, radius=8.0,
    )
    mv = np.asarray(m.valid) & v
    assert mv.sum() > 0.8 * v.sum()
    # Each point matches itself.
    idx = np.asarray(m.idx2)
    assert np.mean(idx[mv] == np.arange(len(uv))[mv]) > 0.9


def _synth_obs(rng, cam, n=120, noise=0.3, outlier_frac=0.1):
    world = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n), rng.uniform(2, 5, n)], -1
    ).astype(np.float32)
    T_gt = np.asarray(se3_exp(jnp.array([0.05, -0.03, 0.02, 0.01, -0.02, 0.015])))
    xc = world @ T_gt[:3, :3].T + T_gt[:3, 3]
    u = cam.fx * xc[:, 0] / xc[:, 2] + cam.cx
    v = cam.fy * xc[:, 1] / xc[:, 2] + cam.cy
    obs = np.stack([u, v], -1) + rng.normal(0, noise, (n, 2))
    n_out = int(n * outlier_frac)
    obs[:n_out] += rng.uniform(20, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return world, obs.astype(np.float32), T_gt, n_out


def test_pose_optimization_converges(rng):
    cam = Camera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)
    world, obs, T_gt, n_out = _synth_obs(rng, cam)
    res = ba.pose_optimization(
        jnp.eye(4),
        jnp.asarray(world),
        jnp.asarray(obs),
        jnp.ones(len(world)),
        jnp.ones(len(world), bool),
        cam,
    )
    T = np.asarray(res.T_cw)
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 5e-3
    assert np.linalg.norm(T[:3, :3] - T_gt[:3, :3]) < 5e-3
    inl = np.asarray(res.inliers)
    assert inl[:n_out].sum() <= 2  # outliers rejected
    assert inl[n_out:].mean() > 0.9


def test_local_bundle_adjustment_reduces_error(rng):
    cam = Camera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)
    K, P = 4, 80
    points_gt = np.stack(
        [rng.uniform(-1, 1, P), rng.uniform(-0.8, 0.8, P), rng.uniform(2, 5, P)], -1
    ).astype(np.float32)
    poses_gt = []
    for k in range(K):
        xi = np.zeros(6, np.float32)
        xi[:3] = [0.3 * k, 0.05 * k, 0.02 * k]
        xi[3:] = [0.0, 0.02 * k, 0.0]
        poses_gt.append(np.asarray(se3_exp(jnp.asarray(xi))))
    poses_gt = np.stack(poses_gt)

    obs_kf, obs_pt, obs_uv = [], [], []
    for k in range(K):
        xc = points_gt @ poses_gt[k, :3, :3].T + poses_gt[k, :3, 3]
        u = cam.fx * xc[:, 0] / xc[:, 2] + cam.cx
        v = cam.fy * xc[:, 1] / xc[:, 2] + cam.cy
        for p in range(P):
            obs_kf.append(k)
            obs_pt.append(p)
            obs_uv.append([u[p] + rng.normal(0, 0.1), v[p] + rng.normal(0, 0.1)])
    obs_kf = jnp.asarray(np.array(obs_kf, np.int32))
    obs_pt = jnp.asarray(np.array(obs_pt, np.int32))
    obs_uv = jnp.asarray(np.array(obs_uv, np.float32))

    # Perturbations well ABOVE the reconstruction CRLB for this geometry
    # (otherwise the ML optimum is legitimately farther from GT than init).
    poses_init = poses_gt.copy()
    poses_init[1:, :3, 3] += rng.normal(0, 0.05, (K - 1, 3))
    points_init = points_gt + rng.normal(0, 0.3, points_gt.shape).astype(np.float32)

    res = ba.local_bundle_adjustment(
        jnp.asarray(poses_init),
        jnp.asarray(points_init),
        obs_kf, obs_pt, obs_uv,
        jnp.ones(len(obs_kf)),
        jnp.ones(len(obs_kf), bool),
        cam,
        outer_iters=30,
    )
    err_before = np.linalg.norm(poses_init[1:, :3, 3] - poses_gt[1:, :3, 3], axis=1).mean()
    err_after = np.linalg.norm(
        np.asarray(res.poses)[1:, :3, 3] - poses_gt[1:, :3, 3], axis=1
    ).mean()
    assert err_after < 0.5 * err_before, (err_before, err_after)
    pt_before = np.linalg.norm(points_init - points_gt, axis=1).mean()
    pt_after = np.linalg.norm(np.asarray(res.points) - points_gt, axis=1).mean()
    assert pt_after < 0.5 * pt_before, (pt_before, pt_after)
