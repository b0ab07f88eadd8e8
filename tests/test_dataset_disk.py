"""Replica / ScanNet on-disk format rehearsals (VERDICT r4 item 8): export
a synthetic sequence to each REAL dataset layout and drive the stock
loaders and the run_rgbd CLI over it — the exact file formats the
reference protocols consume (``scripts/run_replica.sh``,
``scripts/run_scannet.sh``; loaders mirror iMAP/NICE-SLAM Replica exports
and exported ScanNet scans)."""

import json
import os

import numpy as np
import pytest

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.slam.dataset import (
    ReplicaDataset,
    ScanNetDataset,
    SyntheticDataset,
    export_replica_format,
    export_scannet_format,
)


@pytest.fixture(scope="module")
def synth():
    cam = Camera(fx=90.0, fy=90.0, cx=48.0, cy=36.0, width=96, height=72)
    return SyntheticDataset(cam, n_frames=5, n_splats=2000, motion_scale=0.15)


@pytest.fixture(scope="module")
def replica_disk(tmp_path_factory, synth):
    pytest.importorskip("cv2")
    root = str(tmp_path_factory.mktemp("replica") / "room0")
    export_replica_format(synth, root)
    return root


@pytest.fixture(scope="module")
def scannet_disk(tmp_path_factory, synth):
    pytest.importorskip("cv2")
    root = str(tmp_path_factory.mktemp("scannet") / "scene0000_00")
    export_scannet_format(synth, root)
    return root


def test_export_roundtrips_through_replica_loader(replica_disk, synth):
    root = replica_disk
    assert os.path.exists(os.path.join(root, "traj.txt"))
    loaded = ReplicaDataset(root)
    assert len(loaded) == len(synth)
    fr0, src0 = loaded[0], synth[0]
    # JPEG q98 color round trip (lossy — chroma subsampling bounds it)
    assert np.abs(fr0.rgb - src0.rgb).mean() < 6.0 / 255.0
    # PNG16 depth x1/6553.5 quantization
    m = src0.depth > 0
    assert np.abs(fr0.depth - src0.depth)[m].max() < 1.5 / 6553.5
    # traj.txt row-major T_wc inverted back to T_cw
    np.testing.assert_allclose(fr0.gt_T_cw, src0.gt_T_cw, atol=1e-5)


def test_export_roundtrips_through_scannet_loader(scannet_disk, synth):
    root = scannet_disk
    loaded = ScanNetDataset(root)
    assert len(loaded) == len(synth)
    fr2, src2 = loaded[2], synth[2]
    assert np.abs(fr2.rgb - src2.rgb).mean() < 6.0 / 255.0
    m = src2.depth > 0
    # millimeter PNG16
    assert np.abs(fr2.depth - src2.depth)[m].max() < 1.5e-3
    np.testing.assert_allclose(fr2.gt_T_cw, src2.gt_T_cw, atol=1e-5)


@pytest.mark.slow
def test_run_rgbd_cli_on_replica_disk(replica_disk, tmp_path):
    """The reference protocol command (run_rgbd --type replica, the
    run_replica.sh payload) must work on the exported sequence with no
    code edits."""
    from gsorb_slam_tpu.apps.run_rgbd import main

    cfg = tmp_path / "replica_tiny.yaml"
    cfg.write_text(
        """
Dataset: {name: replica_disk_smoke, type: replica, path: "%s"}
Camera: {width: 96, height: 72, fx: 90.0, fy: 90.0, cx: 48.0, cy: 36.0,
         fps: 10.0}
Mapping: {numIters: 5, maxGaussians: 16384}
Tracking: {numIters: 5}
Evalution: {enable: true, savePly: true, saveRootPath: experiments}
"""
        % replica_disk
    )
    out = str(tmp_path / "out")
    rc = main([
        "--config", str(cfg), "--out", out, "--cpu", "--eval-stride", "2",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "result.txt"))
    res = json.loads(open(os.path.join(out, "result.txt")).readlines()[-1])
    assert "ate_rmse" in res and np.isfinite(res["ate_rmse"])


@pytest.mark.slow
def test_run_rgbd_cli_on_scannet_disk(scannet_disk, tmp_path):
    """run_rgbd --type scannet (the run_scannet.sh payload) on the
    exported sequence."""
    from gsorb_slam_tpu.apps.run_rgbd import main

    cfg = tmp_path / "scannet_tiny.yaml"
    cfg.write_text(
        """
Dataset: {name: scannet_disk_smoke, type: scannet, path: "%s"}
Camera: {width: 96, height: 72, fx: 90.0, fy: 90.0, cx: 48.0, cy: 36.0,
         fps: 10.0}
Mapping: {numIters: 5, maxGaussians: 16384}
Tracking: {numIters: 5}
Evalution: {enable: true, savePly: true, saveRootPath: experiments}
"""
        % scannet_disk
    )
    out = str(tmp_path / "out")
    rc = main([
        "--config", str(cfg), "--out", out, "--cpu", "--eval-stride", "2",
    ])
    assert rc == 0
    res = json.loads(open(os.path.join(out, "result.txt")).readlines()[-1])
    assert "ate_rmse" in res and np.isfinite(res["ate_rmse"])
