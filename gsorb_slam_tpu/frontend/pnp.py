"""Robust PnP for relocalization.

Replaces ``PnPsolver`` (EPnP + RANSAC, ``src/PnPsolver.cc:121-1020``) with a
batched-hypothesis DLT-PnP RANSAC: H hypotheses of 6 correspondences each
are solved with one batched SVD, scored by reprojection, and the winner is
polished with the robust Gauss-Newton pose optimizer. Used by
relocalization (``Tracking::Relocalization`` ``src/Tracking.cc:1718-1879``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.frontend.ba import pose_optimization


def _dlt_pose_batch(X: jnp.ndarray, uv_n: jnp.ndarray) -> jnp.ndarray:
    """Batched 6-point DLT: [H, 6, 3] world points + [H, 6, 2] NORMALIZED
    image coords -> [H, 3, 4] projection (R|t up to scale, orthonormalized)."""

    def one(Xs, us):
        rows = []
        for i in range(Xs.shape[0]):
            x, y, z = Xs[i]
            u, v = us[i]
            rows.append(
                jnp.array([x, y, z, 1, 0, 0, 0, 0, -u * x, -u * y, -u * z, -u])
            )
            rows.append(
                jnp.array([0, 0, 0, 0, x, y, z, 1, -v * x, -v * y, -v * z, -v])
            )
        A = jnp.stack(rows)
        _, _, Vt = jnp.linalg.svd(A)
        P = Vt[-1].reshape(3, 4)
        # Fix scale/sign and orthonormalize the rotation part.
        R = P[:, :3]
        U, S, Vt2 = jnp.linalg.svd(R)
        det = jnp.linalg.det(U @ Vt2)
        Rn = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.sign(det)) @ Vt2
        scale = jnp.sign(det) * 3.0 / jnp.maximum(jnp.sum(S), 1e-12)
        t = P[:, 3] * scale
        return jnp.concatenate([Rn, t[:, None]], axis=1)

    return jax.vmap(one)(X, uv_n)


class PnPResult(NamedTuple):
    T_cw: np.ndarray
    inliers: np.ndarray
    n_inliers: int


def ransac_pnp(
    world: np.ndarray,  # [N, 3]
    obs_uv: np.ndarray,  # [N, 2] pixels
    valid: np.ndarray,  # [N] bool
    cam: Camera,
    seed: int = 0,
    n_hyp: int = 256,
    reproj_th: float = 5.99,
    min_inliers: int = 12,
) -> Optional[PnPResult]:
    N = len(world)
    if valid.sum() < 6:
        return None
    key = jax.random.PRNGKey(seed)
    vidx = np.nonzero(valid)[0]
    samples = np.asarray(
        jax.random.randint(key, (n_hyp, 6), 0, len(vidx))
    )
    idx = vidx[samples]

    Kinv = np.linalg.inv(np.asarray(cam.K))
    uv_h = np.concatenate([obs_uv, np.ones((N, 1), np.float32)], 1)
    uv_n = (uv_h @ Kinv.T)[:, :2].astype(np.float32)

    P = _dlt_pose_batch(jnp.asarray(world[idx]), jnp.asarray(uv_n[idx]))
    # Score: reprojection error of ALL points per hypothesis.
    Xw = jnp.asarray(world)
    xc = jnp.einsum("hij,nj->hni", P[:, :, :3], Xw) + P[:, None, :, 3]
    z = xc[..., 2]
    ok_z = z > 1e-3
    zs = jnp.where(ok_z, z, 1.0)
    u = cam.fx * xc[..., 0] / zs + cam.cx
    v = cam.fy * xc[..., 1] / zs + cam.cy
    err = (u - obs_uv[None, :, 0]) ** 2 + (v - obs_uv[None, :, 1]) ** 2
    inl = ok_z & (err < reproj_th**2) & jnp.asarray(valid)[None]
    scores = jnp.sum(inl, axis=1)
    best = int(jnp.argmax(scores))
    if int(scores[best]) < min_inliers:
        return None
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, :] = np.asarray(P[best])

    res = pose_optimization(
        jnp.asarray(T0),
        jnp.asarray(world),
        jnp.asarray(obs_uv),
        jnp.ones(N, jnp.float32),
        jnp.asarray(np.asarray(inl[best])),
        cam,
    )
    inliers = np.asarray(res.inliers)
    if inliers.sum() < min_inliers:
        return None
    return PnPResult(
        T_cw=np.asarray(res.T_cw), inliers=inliers, n_inliers=int(inliers.sum())
    )
