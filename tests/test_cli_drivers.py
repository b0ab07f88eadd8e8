"""Mono/stereo CLI drivers (Examples/{Monocular,Stereo} parity): the shell
entry points must run end-to-end on synthetic sequences and write
trajectories (VERDICT r3 item 8)."""

import json
import os

import pytest

pytestmark = pytest.mark.slow


def test_run_mono_cli(tmp_path):
    from gsorb_slam_tpu.apps.run_mono import main

    out = str(tmp_path / "mono")
    rc = main([
        "--config", "configs/synthetic_mono.yaml", "--type", "synthetic",
        "--max-frames", "7", "--out", out, "--cpu",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "CameraTrajectory_TUM.txt"))
    with open(os.path.join(out, "result.txt")) as f:
        res = json.loads(f.readlines()[-1])
    assert res["frames_tracked"] > 0, "mono bootstrap never succeeded via CLI"


def test_run_stereo_cli(tmp_path):
    pytest.importorskip("cv2")
    from gsorb_slam_tpu.apps.run_stereo import main

    cfg = tmp_path / "stereo.yaml"
    cfg.write_text(
        """
Dataset: {name: stereo_smoke, type: synthetic, path: ""}
Camera: {width: 96, height: 72, fx: 90.0, fy: 90.0, cx: 48.0, cy: 36.0,
         fps: 10.0, bf: 9.0}
Mapping: {numIters: 5, maxGaussians: 16384}
Tracking: {numIters: 5}
Evalution: {enable: false, savePly: false, saveRootPath: experiments}
"""
    )
    out = str(tmp_path / "stereo")
    rc = main([
        "--config", str(cfg), "--type", "synthetic",
        "--max-frames", "2", "--out", out, "--cpu",
    ])
    assert rc == 0
    traj = os.path.join(out, "CameraTrajectory_TUM.txt")
    assert os.path.exists(traj)
    assert len(open(traj).readlines()) == 2
