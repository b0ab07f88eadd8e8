import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import (
    CameraConfig,
    MappingConfig,
    SystemConfig,
    TrackingConfig,
)
from gsorb_slam_tpu.core.transforms import pose_to_matrix
from gsorb_slam_tpu.raster import RasterConfig, render
from gsorb_slam_tpu.slam.dataset import SyntheticDataset
from gsorb_slam_tpu.slam.system import System
from gsorb_slam_tpu.slam.tracking import FeatureMatches, track_frame
from gsorb_slam_tpu.eval.ate import ate_rmse

from tests.scenes import random_cloud_scene, tiny_camera

# Tiny test images seed one splat per pixel, so per-tile instance density
# is ~tile_px; capacity must be a few multiples of that.
RCFG = RasterConfig(tile=16, tile_capacity=2048, max_dup=16, chunk=128, dilate_px=8.0)


def _gm_from_scene(scene):
    """Wrap raw scene arrays in a GaussianMap-shaped object for track_frame."""
    from gsorb_slam_tpu.splat.gaussians import empty_map

    gm = empty_map(scene["means"].shape[0])
    gm = dataclasses.replace(
        gm,
        means=scene["means"],
        rgb=scene["rgb"],
        quats=scene["quats"],
        logit_opacities=scene["logit_opacities"],
        log_scales=scene["log_scales"],
        active=scene["active"],
        count=jnp.asarray(scene["means"].shape[0], jnp.int32),
    )
    return gm


def test_tracking_recovers_perturbed_pose(rng):
    """Render GT from a known pose, start tracking from a perturbed pose,
    and check the optimizer pulls the pose back (the core
    RenderStartTraking behavior)."""
    cam = tiny_camera(w=64, h=48, f=60.0)
    scene = random_cloud_scene(rng, n=600, capacity=640, spread=1.6)
    scene["logit_opacities"] = jnp.full_like(scene["logit_opacities"], 6.0)
    gm = _gm_from_scene(scene)

    T_gt = np.eye(4, dtype=np.float32)
    out_gt = render(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, jnp.asarray(T_gt), cam, RCFG,
    )
    gt_color = out_gt.color
    gt_depth = jnp.where(out_gt.alpha > 0.5, out_gt.median_depth, 0.0)

    T_init = np.asarray(
        pose_to_matrix(
            jnp.array([1.0, 0.004, -0.003, 0.005]), jnp.array([0.015, -0.01, 0.012])
        )
    )
    tcfg = TrackingConfig(num_iters=60, use_sur_depth=True)
    res = track_frame(
        gm, jnp.asarray(T_init), gt_color, gt_depth, FeatureMatches.empty(),
        cam, tcfg, RCFG,
    )
    err_init = np.linalg.norm(T_init[:3, 3] - T_gt[:3, 3])
    err_final = np.linalg.norm(np.asarray(res.T_cw)[:3, 3] - T_gt[:3, 3])
    assert err_final < 0.6 * err_init, (err_init, err_final)
    assert np.isfinite(float(res.loss))


def test_tracking_feature_term_pulls_pose(rng):
    """With photometric weights zeroed, the chi^2 ORB term alone must drive
    the pose toward the reprojection optimum."""
    cam = tiny_camera(w=64, h=48, f=60.0)
    scene = random_cloud_scene(rng, n=32, capacity=64)
    gm = _gm_from_scene(scene)

    world = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    world[:, 2] = rng.uniform(2.0, 4.0, 64)
    T_gt = np.eye(4, dtype=np.float32)
    u = cam.fx * world[:, 0] / world[:, 2] + cam.cx
    v = cam.fy * world[:, 1] / world[:, 2] + cam.cy
    matches = FeatureMatches(
        obs_uv=jnp.asarray(np.stack([u, v], -1)),
        world=jnp.asarray(world),
        inv_sigma2=jnp.ones(64, jnp.float32),
        valid=jnp.ones(64, bool),
    )
    T_init = np.eye(4, dtype=np.float32)
    T_init[:3, 3] = [0.03, -0.02, 0.04]
    tcfg = TrackingConfig(
        num_iters=200, im_weight=0.0, depth_weight=0.0, feature_weight=1.0,
        early_stop_delta=1e-6,
    )
    zero = jnp.zeros((cam.height, cam.width, 3))
    res = track_frame(
        gm, jnp.asarray(T_init), zero, zero[..., 0], matches, cam, tcfg, RCFG
    )
    err_init = np.linalg.norm(T_init[:3, 3])
    err_final = np.linalg.norm(np.asarray(res.T_cw)[:3, 3])
    assert err_final < 0.4 * err_init, (err_init, err_final)
    # chi^2 at the recovered pose must be far below the initial.
    from gsorb_slam_tpu.slam.tracking import reprojection_chi2

    chi_init = float(jnp.sum(reprojection_chi2(jnp.asarray(T_init), matches, cam)))
    chi_final = float(jnp.sum(res.chi2))
    assert chi_final < 0.2 * chi_init


def _small_config(cam_w=64, cam_h=48, f=60.0):
    return SystemConfig(
        camera=CameraConfig(width=cam_w, height=cam_h, fx=f, fy=f, cx=cam_w / 2, cy=cam_h / 2, fps=10),
        mapping=MappingConfig(
            num_iters=25,
            init_iters=40,
            max_gaussians=16384,
            window_size=6,
            covis_window=3,
            madien_mul=10.0,
        ),
        tracking=TrackingConfig(num_iters=30),
    )


@pytest.mark.slow
def test_system_end_to_end_synthetic():
    """Full System loop on a synthetic sequence: ATE must be small and the
    final map must re-render the first frame with decent PSNR."""
    cfg = _small_config()
    cam = Camera(fx=60.0, fy=60.0, cx=32.0, cy=24.0, width=64, height=48)
    ds = SyntheticDataset(cam, n_frames=8, n_splats=1500, seed=3, motion_scale=0.12)
    sys = System(
        cfg,
        max_keyframes=16,
        raster=RCFG,
    )
    est, gt = [], []
    for fr in ds:
        T = sys.track_rgbd(fr.rgb, fr.depth, fr.timestamp)
        est.append(T)
        gt.append(fr.gt_T_cw)
    rmse = ate_rmse(est, gt)
    assert rmse < 0.03, f"ATE {rmse}"

    from gsorb_slam_tpu.ops.metrics import psnr

    out = sys.render_view(ds[0].gt_T_cw)
    val = float(psnr(out.color, jnp.asarray(ds[0].rgb), jnp.asarray(ds[0].depth > 0)))
    assert val > 17.0, f"PSNR {val}"
    s = sys.shutdown_summary()
    assert s["n_frames"] == 8 and s["total_gaussians"] > 500


def test_ate_identity_and_known_offset(rng):
    Ts = []
    for i in range(10):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(size=3)
        Ts.append(T)
    assert ate_rmse(Ts, Ts) < 1e-6
    # Global rigid offset is absorbed by alignment.
    off = np.eye(4, dtype=np.float32)
    off[:3, 3] = [1.0, 2.0, 3.0]
    Ts2 = [T @ off for T in Ts]
    assert ate_rmse(Ts2, Ts) < 1e-5


def test_ply_roundtrip(rng, tmp_path):
    from gsorb_slam_tpu.eval.ply import load_gaussian_ply, save_gaussian_ply

    n = 57
    arrs = dict(
        means=rng.normal(size=(n, 3)).astype(np.float32),
        rgb=rng.uniform(size=(n, 3)).astype(np.float32),
        logit_opacities=rng.normal(size=n).astype(np.float32),
        log_scales=rng.normal(size=(n, 3)).astype(np.float32),
        quats=rng.normal(size=(n, 4)).astype(np.float32),
    )
    p = str(tmp_path / "GaussianModel.ply")
    count = save_gaussian_ply(
        p, arrs["means"], arrs["rgb"], arrs["logit_opacities"],
        arrs["log_scales"], arrs["quats"],
    )
    assert count == n
    back = load_gaussian_ply(p)
    for k in arrs:
        np.testing.assert_allclose(back[k].reshape(arrs[k].shape), arrs[k], rtol=1e-6)


def test_trajectory_tum_roundtrip(rng, tmp_path):
    from gsorb_slam_tpu.eval.trajectory import load_tum, save_tum

    traj = []
    for i in range(5):
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        from gsorb_slam_tpu.core.transforms import pose_to_matrix as p2m

        T = np.asarray(p2m(jnp.asarray(q), jnp.asarray(rng.normal(size=3).astype(np.float32))))
        traj.append((float(i), T))
    p = str(tmp_path / "traj.txt")
    save_tum(p, traj)
    back = load_tum(p)
    for (_, a), (_, b) in zip(traj, back):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_window_selection_basic(rng):
    from gsorb_slam_tpu.slam.window import KeyFrameMeta, select_window, sample_reference_points

    depth = np.ones((48, 64), np.float32) * 2.0
    pts = sample_reference_points(depth, 60, 60, 32, 24, n_points=200, rng=rng)
    assert pts.shape == (200, 4)
    # Border-only sampling: no point projects from the masked center.
    u = 60 * pts[:, 0] / pts[:, 2] + 32
    v = 60 * pts[:, 1] / pts[:, 2] + 24
    inside_center = (u > 16) & (u < 48) & (v > 12) & (v < 36)
    assert not inside_center.any()

    kfs = []
    for i in range(12):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.05 * i
        kfs.append(
            KeyFrameMeta(kf_id=i, frame_id=i * 5, T_cw=T, ref_points_cam=pts)
        )
    kfs[6].rendered_num = 3
    sel = select_window(
        kfs, kfs[-1], 60, 60, 60, 32, 24, 64, 48, rng,
        n_covis=4, n_random_fill=3, n_recent_ba=2, n_anchor=2,
    )
    assert sel.anchor_ids == [0, 1]
    assert len(set(sel.kf_ids)) == len(sel.kf_ids)  # no duplicates
    assert 6 in sel.kf_ids  # BA-touched keyframe included
    assert kfs[6].rendered_num == 0  # counter reset on use


@pytest.mark.slow
def test_tracking_recovers_large_drift():
    """Production tracking budget (200 iters, dilate 4, rebins 8/40/120)
    must recover a ~13px initial pose error on a structured scene — the
    r2 VGA-collapse regression: with stale bins (dilate 2, rebin@16 only)
    the 200-iter pose walk leaves binning validity and stalls at ~50%
    residual; the production cadence converges to <10%."""
    import jax.numpy as jnp

    from gsorb_slam_tpu.core.config import MappingConfig, TrackingConfig
    from gsorb_slam_tpu.core.transforms import se3_exp
    from gsorb_slam_tpu.raster.binning import bin_gaussians
    from gsorb_slam_tpu.raster.preprocess import preprocess
    from gsorb_slam_tpu.raster.tiled import render_tiled
    from gsorb_slam_tpu.slam.mapping import seed_from_frame
    from gsorb_slam_tpu.slam.tracking import FeatureMatches, track_frame
    from gsorb_slam_tpu.splat.gaussians import empty_map

    cam = Camera(fx=180.0, fy=180.0, cx=64.0, cy=48.0, width=128, height=96)
    mcfg = MappingConfig(max_gaussians=16384)
    rng = np.random.default_rng(4)
    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    col = np.stack([xx / W, yy / H, 0.5 + 0.3 * np.sin(xx / 9) * np.cos(yy / 7)], -1)
    for _ in range(25):
        cy_, cx_ = rng.uniform(0, H), rng.uniform(0, W)
        s = rng.uniform(4, 10)
        col[..., rng.integers(0, 3)] += rng.uniform(-0.5, 0.5) * np.exp(
            -(((yy - cy_) ** 2 + (xx - cx_) ** 2) / (2 * s * s))
        )
    color0 = jnp.asarray(np.clip(col, 0, 1).astype(np.float32))
    depth0 = jnp.asarray(
        (1.8 + 0.3 * np.sin(xx / 25) + 0.2 * np.cos(yy / 20)).astype(np.float32)
    )
    T_id = jnp.eye(4, dtype=jnp.float32)
    gm = empty_map(mcfg.max_gaussians)
    gm = seed_from_frame(gm, color0, depth0, T_id, cam, mcfg)

    xi = jnp.asarray([0.07, -0.03, 0.0, 0.0, 0.03, 0.0], jnp.float32)  # ~13px
    T_gt = se3_exp(xi) @ T_id
    rc0 = RasterConfig(tile=16, tile_capacity=512, max_dup=16, chunk=64)
    p = preprocess(gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
                   gm.active, T_gt, cam)
    out = render_tiled(p, bin_gaussians(p, cam, rc0), cam, rc0)
    gt_c = out.color
    gt_d = jnp.where(out.alpha > 0.5, out.median_depth, 0.0)

    rc = RasterConfig(tile=16, tile_capacity=512, max_dup=16, chunk=64,
                      dilate_px=4.0, backend="pallas", exact_stop=False,
                      fused_tiles_per_step=2)
    tc = TrackingConfig(num_iters=200, early_stop_delta=0.0)
    res = jax.jit(
        lambda: track_frame(gm, T_id, gt_c, gt_d, FeatureMatches.empty(),
                            cam, tc, rc, rebin_iters=(8, 40, 120))
    )()
    err0 = float(jnp.abs(T_gt - T_id).max())
    err = float(jnp.abs(T_gt - res.T_cw).max())
    assert err < 0.10 * err0, (err0, err)


@pytest.mark.slow
def test_tracking_recovers_pose_elem_bf16(rng):
    """elem_bf16's ~1% per-element weight noise must not break tracking
    CONVERGENCE: the pallas fast path (interpret) with bf16 slabs recovers a
    perturbed pose at least as far as the acceptance bar of the f32 test
    above (same scene/budget)."""
    cam = tiny_camera(w=64, h=48, f=60.0)
    scene = random_cloud_scene(rng, n=600, capacity=640, spread=1.6)
    scene["logit_opacities"] = jnp.full_like(scene["logit_opacities"], 6.0)
    gm = _gm_from_scene(scene)

    rcfg = dataclasses.replace(
        RCFG, backend="pallas", exact_stop=False, chunk=64, elem_bf16=True
    )
    T_gt = np.eye(4, dtype=np.float32)
    out_gt = render(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, jnp.asarray(T_gt), cam, RCFG,
    )
    gt_color = out_gt.color
    gt_depth = jnp.where(out_gt.alpha > 0.5, out_gt.median_depth, 0.0)

    T_init = np.asarray(
        pose_to_matrix(
            jnp.array([1.0, 0.004, -0.003, 0.005]), jnp.array([0.015, -0.01, 0.012])
        )
    )
    tcfg = TrackingConfig(num_iters=60, use_sur_depth=True)
    res = track_frame(
        gm, jnp.asarray(T_init), gt_color, gt_depth, FeatureMatches.empty(),
        cam, tcfg, rcfg,
    )
    err_init = np.linalg.norm(T_init[:3, 3] - T_gt[:3, 3])
    err_final = np.linalg.norm(np.asarray(res.T_cw)[:3, 3] - T_gt[:3, 3])
    assert err_final < 0.6 * err_init, (err_init, err_final)
    assert np.isfinite(float(res.loss))
