"""CLI apps + native library smoke tests (synthetic data, CPU)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_run_rgbd_cli_synthetic(tmp_path):
    from gsorb_slam_tpu.apps.run_rgbd import main

    out = str(tmp_path / "run")
    rc = main(
        [
            "--config", "configs/synthetic.yaml", "--type", "synthetic",
            "--max-frames", "4", "--cpu", "--eval-stride", "2", "--out", out,
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out, "GaussianModel.ply"))
    assert os.path.exists(os.path.join(out, "CameraTrajectory_TUM.txt"))
    result = json.loads(open(os.path.join(out, "result.txt")).read().splitlines()[-1])
    assert np.isfinite(result["psnr"])
    assert result["n_eval_frames"] >= 2
    assert "ate_rmse" in result


def test_viewer_and_replay_cli(tmp_path):
    from gsorb_slam_tpu.apps.run_rgbd import main as run_main
    from gsorb_slam_tpu.apps.viewer import main as viewer_main

    out = str(tmp_path / "run")
    run_main(
        [
            "--config", "configs/synthetic.yaml", "--type", "synthetic",
            "--max-frames", "3", "--cpu", "--no-eval", "--out", out,
        ]
    )
    vout = str(tmp_path / "views")
    rc = viewer_main(
        [
            "--ply", os.path.join(out, "GaussianModel.ply"),
            "--config", "configs/synthetic.yaml",
            "--mode", "replay",
            "--traj", os.path.join(out, "CameraTrajectory_TUM.txt"),
            "--out", vout,
        ]
    )
    assert rc == 0
    assert len(os.listdir(vout)) == 3


def test_eval_ate_cli(tmp_path):
    from gsorb_slam_tpu.apps.eval_ate import main
    from gsorb_slam_tpu.eval.trajectory import save_tum

    traj = [(float(i), np.eye(4, dtype=np.float32)) for i in range(10)]
    for i, (_, T) in enumerate(traj):
        T[:3, 3] = [0.1 * i, 0, 0]
    p1 = str(tmp_path / "gt.txt")
    p2 = str(tmp_path / "est.txt")
    save_tum(p1, traj)
    save_tum(p2, traj)
    assert main([p1, p2]) == 0


def test_native_quadtree_spreads(rng):
    from gsorb_slam_tpu.frontend.native import have_native, quadtree_distribute

    n = 3000
    x = rng.uniform(0, 640, n).astype(np.float32)
    y = rng.uniform(0, 480, n).astype(np.float32)
    # Response correlated with x: pure top-k piles onto one image side,
    # the quad-tree must still spread selections spatially.
    r = (x / 640.0 + 0.1 * rng.uniform(0, 1, n)).astype(np.float32)
    keep = quadtree_distribute(x, y, r, 500)
    assert keep.sum() == 500
    if have_native():
        # Quad-tree must COVER the image; response-biased top-k clusters.
        def coverage(mask):
            hist = np.histogram2d(y[mask], x[mask], bins=(8, 8))[0]
            return (hist > 0).mean()

        topk = np.zeros(n, bool)
        topk[np.argsort(-r)[:500]] = True
        assert coverage(keep) > coverage(topk)
        assert abs(x[keep].mean() - 320) < 80  # spatially centered
        assert x[topk].mean() > 450  # the top-k baseline clusters right


def test_native_association_matches_python(rng):
    from gsorb_slam_tpu.frontend.native import (
        associate_timestamps_native,
        have_native,
    )
    from gsorb_slam_tpu.slam.dataset import associate_timestamps

    a = np.sort(rng.uniform(0, 50, 200))
    b = np.sort(rng.uniform(0, 50, 190))
    py = associate_timestamps(a, b, 0.05)
    nat = associate_timestamps_native(a, b, 0.05)
    if have_native():
        # Both greedy nearest: association counts should be close, pairs valid.
        assert abs(len(nat) - len(py)) <= max(3, 0.1 * len(py))
        for i, j in nat:
            assert abs(a[i] - b[j]) < 0.05


def test_quadtree_refine_keeps_budget(rng):
    import jax.numpy as jnp

    from gsorb_slam_tpu.core.config import ORBConfig
    from gsorb_slam_tpu.frontend.orb import extract_orb, quadtree_refine

    img = np.zeros((120, 160), np.float32)
    for _ in range(80):
        yy, xx = rng.integers(22, 90), rng.integers(22, 130)
        img[yy : yy + 8, xx : xx + 8] = rng.uniform(0.4, 1.0)
    cfg = ORBConfig(n_features=200, n_levels=2)
    feats = extract_orb(jnp.asarray(img), cfg)
    refined = quadtree_refine(feats, cfg)
    assert int(refined.count()) <= int(feats.count())
    assert int(refined.count()) > 0


def test_viewer_web_server_roundtrip(rng, tmp_path):
    """ViewerServer serves the page, the state, and renders orbit poses
    over a live HTTP round trip (Viewer2 free-view capability)."""
    import json
    import threading
    import urllib.request
    from http.server import HTTPServer

    import numpy as np

    from gsorb_slam_tpu.apps.viewer_web import ViewerServer, orbit_pose

    H, W = 48, 64
    calls = []

    def render_fn(T_cw):
        calls.append(np.asarray(T_cw))
        img = np.zeros((H, W, 3), np.float32)
        img[:, :, 0] = 0.5
        return img

    srv = ViewerServer(render_fn, W, H, center=np.array([0.0, 0.0, 2.0]),
                       dist0=2.0)
    httpd = HTTPServer(("127.0.0.1", 0), srv.handler())
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read()
        assert b"orbit" in page
        state = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/state", timeout=10
            ).read()
        )
        assert state["width"] == W and state["dist"] == 2.0
        state["yaw"] = 0.4
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps(state).encode(), method="POST",
        )
        img_bytes = urllib.request.urlopen(req, timeout=20).read()
        assert len(img_bytes) > 100  # an encoded image came back
        assert len(calls) == 1
        # the rendered pose looks at the center from the yawed orbit
        T = calls[0]
        center_cam = T[:3, :3] @ [0.0, 0.0, 2.0] + T[:3, 3]
        np.testing.assert_allclose(center_cam, [0, 0, 2.0], atol=1e-5)
    finally:
        httpd.shutdown()

    # orbit_pose geometry: the camera always looks at the target
    for yaw, pitch in [(0.0, 0.0), (1.0, 0.3), (-2.0, -0.5)]:
        T = orbit_pose(np.array([1.0, -0.5, 3.0]), yaw, pitch, 1.7)
        cc = T[:3, :3] @ [1.0, -0.5, 3.0] + T[:3, 3]
        np.testing.assert_allclose(cc, [0, 0, 1.7], atol=1e-5)


def test_viewer_web_map_mode_and_live_system(rng):
    """The 'map' view mode serves a 3D points+frusta+graph rendering over
    HTTP, and ViewerServer.from_system attaches live to a running System
    (the reference's in-run Pangolin map view, src/MapDrawer.cc)."""
    import json
    import threading
    import urllib.request
    from http.server import HTTPServer

    import numpy as np

    from gsorb_slam_tpu.apps.viewer_web import ViewerServer
    from gsorb_slam_tpu.core.config import (
        CameraConfig,
        MappingConfig,
        ORBConfig,
        SystemConfig,
        TrackingConfig,
    )
    from gsorb_slam_tpu.slam.system import System
    from gsorb_slam_tpu.utils.drawing import draw_map_3d

    # Pure drawing: points in front of an identity view produce non-empty
    # pixels; keyframe frusta and the graph line are drawn.
    pts = np.stack(
        [rng.uniform(-0.5, 0.5, 200), rng.uniform(-0.5, 0.5, 200),
         rng.uniform(1.0, 2.0, 200)], -1,
    ).astype(np.float32)
    kfA = np.eye(4, dtype=np.float32)
    kfB = np.eye(4, dtype=np.float32)
    kfB[0, 3] = -0.3
    img = draw_map_3d(
        pts, np.eye(4, dtype=np.float32), 96, 72,
        kf_T_cw=[kfA, kfB], graph_edges=[(0, 1)],
        cur_T_cw=kfB, trajectory=np.zeros((3, 3), np.float32),
    )
    assert img.shape == (72, 96, 3)
    assert (img != 15).any()  # something was drawn over the background

    # Live System attachment + HTTP round trip in map mode.
    cam = CameraConfig(width=96, height=72, fx=80.0, fy=80.0, cx=48.0,
                       cy=36.0, fps=30)
    cfg = SystemConfig(
        camera=cam, orb=ORBConfig(n_features=100),
        mapping=MappingConfig(num_iters=2, init_iters=2,
                              max_gaussians=1 << 12),
        tracking=TrackingConfig(num_iters=2),
    )
    s = System(cfg, max_keyframes=4, frontend="render")
    rgb = rng.uniform(0, 1, (72, 96, 3)).astype(np.float32)
    depth = np.full((72, 96), 1.5, np.float32)
    s.track_rgbd(rgb, depth, 0.0)
    srv = ViewerServer.from_system(s)
    assert srv.map_state_fn is not None
    httpd = HTTPServer(("127.0.0.1", 0), srv.handler())
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        state = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/state", timeout=10
            ).read()
        )
        assert state["mode"] == "splat"
        state["mode"] = "map"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps(state).encode(), method="POST",
        )
        img_bytes = urllib.request.urlopen(req, timeout=30).read()
        assert len(img_bytes) > 100
    finally:
        httpd.shutdown()


def test_gauge_align_gt_to_est_removes_rigid_offset():
    """A map gauge-offset from GT by a fixed rigid transform is NOT map
    damage: after gauge_align_gt_to_est the aligned GT poses must equal
    the estimated ones exactly (r4 verdict item 5 — the GT-pose render
    twin must score map quality, not the gauge)."""
    import numpy as np

    from gsorb_slam_tpu.core.transforms import se3_exp
    from gsorb_slam_tpu.eval.ate import gauge_align_gt_to_est

    rng = np.random.default_rng(3)
    # a wiggly GT trajectory
    gt = []
    T = np.eye(4, dtype=np.float64)
    for i in range(12):
        xi = 0.1 * rng.standard_normal(6)
        T = T @ np.asarray(se3_exp(xi), np.float64)
        gt.append(T.copy())
    # the estimated trajectory = GT composed with one fixed gauge S
    S = np.asarray(se3_exp(np.array([0.2, -0.1, 0.3, 0.05, -0.2, 0.1])),
                   np.float64)
    est = [g @ S for g in gt]
    aligned = gauge_align_gt_to_est(est, gt)
    for a, e in zip(aligned, est):
        np.testing.assert_allclose(a, e, atol=1e-5)
