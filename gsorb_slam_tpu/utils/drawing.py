"""Debug drawing: feature overlays and top-down map views.

Headless equivalents of ``FrameDrawer`` (2D keypoint/match overlay) and
``MapDrawer`` (3D points/keyframes/graph) — the reference renders these into
its Pangolin/ImGui viewers (``src/FrameDrawer.cc``, ``src/MapDrawer.cc``);
here they produce plain numpy images any frontend (notebook, file, web)
can display.
"""

from __future__ import annotations

import numpy as np


def draw_keypoints(
    rgb: np.ndarray,  # [H, W, 3] float 0..1
    uv: np.ndarray,  # [N, 2]
    valid: np.ndarray | None = None,
    matched: np.ndarray | None = None,
    radius: int = 2,
) -> np.ndarray:
    """Overlay keypoints: green = matched (tracked map point), blue = not.
    (``FrameDrawer::DrawFrame`` color scheme.)"""
    img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8).copy()
    H, W = img.shape[:2]
    n = len(uv)
    valid = np.ones(n, bool) if valid is None else np.asarray(valid, bool)
    matched = np.zeros(n, bool) if matched is None else np.asarray(matched, bool)
    ys = np.clip(uv[:, 1].astype(int), radius, H - radius - 1)
    xs = np.clip(uv[:, 0].astype(int), radius, W - radius - 1)
    for y, x, v, m in zip(ys, xs, valid, matched):
        if not v:
            continue
        color = (40, 230, 70) if m else (70, 130, 240)
        img[y - radius : y + radius + 1, [x - radius, x + radius]] = color
        img[[y - radius, y + radius], x - radius : x + radius + 1] = color
    return img


def draw_map_topdown(
    means: np.ndarray,  # [N, 3] splat / map-point centers
    active: np.ndarray | None = None,
    kf_positions: np.ndarray | None = None,  # [K, 3] camera centers
    trajectory: np.ndarray | None = None,  # [T, 3]
    size: int = 512,
    axes: tuple[int, int] = (0, 2),  # x-z top-down
) -> np.ndarray:
    """Top-down scatter of the map: gray points, red keyframes, green
    trajectory (``MapDrawer::DrawMapPoints``/``DrawKeyFrames`` analog)."""
    img = np.full((size, size, 3), 15, np.uint8)
    if active is not None:
        means = means[np.asarray(active, bool)]
    if len(means) == 0:
        return img
    a, b = axes
    all_pts = [means[:, [a, b]]]
    if kf_positions is not None and len(kf_positions):
        all_pts.append(kf_positions[:, [a, b]])
    if trajectory is not None and len(trajectory):
        all_pts.append(trajectory[:, [a, b]])
    cat = np.concatenate(all_pts)
    lo = np.percentile(cat, 1, axis=0)
    hi = np.percentile(cat, 99, axis=0)
    span = np.maximum(hi - lo, 1e-6)

    def to_px(p):
        q = (p - lo) / span
        return np.clip((q * (size - 1)).astype(int), 0, size - 1)

    mp = to_px(means[:, [a, b]])
    img[mp[:, 1], mp[:, 0]] = (170, 170, 170)
    if trajectory is not None and len(trajectory):
        tp = to_px(trajectory[:, [a, b]])
        img[tp[:, 1], tp[:, 0]] = (60, 220, 60)
    if kf_positions is not None and len(kf_positions):
        kp = to_px(kf_positions[:, [a, b]])
        for y, x in zip(kp[:, 1], kp[:, 0]):
            img[max(y - 2, 0) : y + 3, max(x - 2, 0) : x + 3] = (60, 60, 230)
    return img


def camera_centers(T_cw_list) -> np.ndarray:
    """[T,4,4] or list of T_cw -> [T, 3] camera centers in world frame."""
    out = []
    for T in T_cw_list:
        R = T[:3, :3]
        t = T[:3, 3]
        out.append(-R.T @ t)
    return np.stack(out) if out else np.zeros((0, 3), np.float32)
