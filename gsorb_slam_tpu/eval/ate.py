"""Absolute trajectory error via Horn alignment.

Equivalent of ``scripts/tum_ate.py:47-79`` (align) and the RMSE print at
``:162`` — the closed-form similarity/rigid alignment of estimated vs
ground-truth camera centers followed by RMSE of the residuals.
"""

from __future__ import annotations

import numpy as np


def horn_align(
    model: np.ndarray, data: np.ndarray, with_scale: bool = False
) -> tuple[np.ndarray, np.ndarray, float]:
    """Least-squares rigid (optionally Sim3) alignment model -> data.

    ``model``/``data``: [N, 3] corresponding points. Returns (R, t, s) with
    ``data ~= s * R @ model + t``.
    """
    mu_m = model.mean(axis=0)
    mu_d = data.mean(axis=0)
    mc = model - mu_m
    dc = data - mu_d
    W = dc.T @ mc
    U, S, Vt = np.linalg.svd(W)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1.0
    R = U @ D @ Vt
    if with_scale:
        s = float((S * np.diag(D)).sum() / (mc**2).sum())
    else:
        s = 1.0
    t = mu_d - s * R @ mu_m
    return R, t, s


def ate_rmse(
    est_T_cw: list[np.ndarray] | np.ndarray,
    gt_T_cw: list[np.ndarray] | np.ndarray,
    with_scale: bool = False,
) -> float:
    """ATE RMSE (meters) between aligned camera-center trajectories.

    Non-finite estimated poses (a diverged tracker) are excluded from the
    alignment pairs rather than crashing the SVD; if every pose is bad the
    result is ``inf`` (matching how a fully lost run should score)."""
    est_c = np.stack([_center(T) for T in est_T_cw])
    gt_c = np.stack([_center(T) for T in gt_T_cw])
    ok = np.isfinite(est_c).all(axis=1) & np.isfinite(gt_c).all(axis=1)
    if not ok.all():
        if ok.sum() < 3:
            return float("inf")
        est_c, gt_c = est_c[ok], gt_c[ok]
    R, t, s = horn_align(est_c, gt_c, with_scale)
    aligned = est_c @ (s * R).T + t
    err = aligned - gt_c
    return float(np.sqrt((err**2).sum(axis=1).mean()))


def _center(T_cw: np.ndarray) -> np.ndarray:
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    return -R.T @ t
