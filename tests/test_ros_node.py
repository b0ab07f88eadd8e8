"""ROS-node helper tests (rospy-free): sensor_msgs/Image decoding and the
approximate-time pairing — the testable core of ``apps/ros_node.py``
(reference: ``Examples/ROS/ORB_SLAM2/src/ros_rgbd.cc``)."""

import types

import numpy as np

from gsorb_slam_tpu.apps.ros_node import ApproxTimeSync, decode_image


def _msg(arr: np.ndarray, encoding: str, pad: int = 0) -> types.SimpleNamespace:
    h, w = arr.shape[:2]
    ch = arr.shape[2] if arr.ndim == 3 else 1
    itemsize = arr.dtype.itemsize
    step = w * ch * itemsize + pad
    rows = []
    for r in range(h):
        row = arr[r].tobytes()
        rows.append(row + b"\x00" * pad)
    return types.SimpleNamespace(
        encoding=encoding, height=h, width=w, step=step,
        data=b"".join(rows), is_bigendian=0,
    )


def test_decode_rgb8_and_bgr8():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (4, 6, 3), np.uint8)
    out = decode_image(_msg(img, "rgb8"))
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0)
    out_bgr = decode_image(_msg(img[..., ::-1].copy(), "bgr8"))
    np.testing.assert_allclose(out_bgr, img.astype(np.float32) / 255.0)


def test_decode_depth_16uc1_with_row_padding_and_factor():
    d_mm = np.array([[0, 1000, 2500], [5000, 123, 65535]], np.uint16)
    # TUM DepthMapFactor 5000 (src/Tracking.cc:275-276); 3-byte row padding
    out = decode_image(_msg(d_mm, "16UC1", pad=3), depth_factor=5000.0)
    np.testing.assert_allclose(out, d_mm.astype(np.float32) / 5000.0)
    assert out.dtype == np.float32 and out.shape == (2, 3)


def test_decode_depth_32fc1_passthrough():
    d = np.array([[0.5, 1.25]], np.float32)
    out = decode_image(_msg(d, "32FC1"), depth_factor=5000.0)
    np.testing.assert_allclose(out, d)  # meters already: factor ignored


def test_approx_sync_pairs_within_window_in_order():
    pairs = []
    sync = ApproxTimeSync(lambda t, a, b: pairs.append((t, a, b)), max_dt=0.02)
    sync.push(0, 0.000, "rgb0")
    sync.push(1, 0.011, "d0")     # within 20 ms of rgb0 -> pair
    sync.push(0, 0.100, "rgb1")
    sync.push(0, 0.200, "rgb2")
    sync.push(1, 0.201, "d2")     # rgb1 has no partner: dropped as too old
    assert pairs == [(0.000, "rgb0", "d0"), (0.200, "rgb2", "d2")]


def test_approx_sync_drops_stale_unmatched():
    pairs = []
    sync = ApproxTimeSync(lambda t, a, b: pairs.append((a, b)), max_dt=0.01)
    for i in range(5):
        sync.push(0, i * 0.1, f"rgb{i}")  # depth stream silent: nothing pairs
    assert pairs == []
    sync.push(1, 0.4005, "d4")
    assert pairs == [("rgb4", "d4")]
