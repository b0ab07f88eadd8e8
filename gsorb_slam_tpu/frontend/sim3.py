"""Closed-form Sim3/SE3 alignment + RANSAC for loop verification.

Replaces ``Sim3Solver`` (``src/Sim3Solver.cc:115-412``): Horn's method on
matched 3D point triples with batched RANSAC hypotheses instead of the
sequential loop. For RGB-D/stereo the scale is fixed at 1
(``mbFixScale``), matching the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def horn_alignment(p1: jnp.ndarray, p2: jnp.ndarray, fix_scale: bool = True):
    """Least-squares (Sim3 or SE3) p2 ~= s R p1 + t for [.., N, 3] sets."""
    mu1 = jnp.mean(p1, axis=-2, keepdims=True)
    mu2 = jnp.mean(p2, axis=-2, keepdims=True)
    c1 = p1 - mu1
    c2 = p2 - mu2
    W = jnp.einsum("...ni,...nj->...ij", c2, c1, precision=jax.lax.Precision.HIGHEST)
    U, S, Vt = jnp.linalg.svd(W)
    det = jnp.linalg.det(jnp.matmul(U, Vt))
    Dm = jnp.zeros_like(W).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(jnp.sign(det))
    R = jnp.matmul(U, jnp.matmul(Dm, Vt))
    if fix_scale:
        s = jnp.ones(W.shape[:-2])
    else:
        num = jnp.sum(S * jnp.stack([jnp.ones_like(det)] * 2 + [jnp.sign(det)], -1), -1)
        s = num / jnp.maximum(jnp.sum(c1 * c1, axis=(-1, -2)), 1e-12)
    t = mu2[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu1[..., 0, :])
    return s, R, t


class Sim3Result(NamedTuple):
    R: jnp.ndarray  # [3, 3]
    t: jnp.ndarray  # [3]
    s: jnp.ndarray  # []
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # [] int32


def ransac_sim3(
    p1: jnp.ndarray,  # [N, 3] matched points (frame 1)
    p2: jnp.ndarray,  # [N, 3] matched points (frame 2)
    valid: jnp.ndarray,  # [N] bool
    key: jnp.ndarray,
    n_hyp: int = 128,
    inlier_th: float = 0.09,  # squared meters (~0.3m) 3D consistency
    fix_scale: bool = True,
) -> Sim3Result:
    """Batched-hypothesis RANSAC: sample N_hyp triples at once, score all,
    refine the winner on its inliers."""
    N = p1.shape[0]
    idx = jax.random.randint(key, (n_hyp, 3), 0, jnp.maximum(N, 1))
    s, R, t = horn_alignment(p1[idx], p2[idx], fix_scale)  # batched
    pred = s[:, None, None] * jnp.einsum("hij,nj->hni", R, p1) + t[:, None, :]
    err = jnp.sum((pred - p2[None]) ** 2, -1)  # [H, N]
    inl = (err < inlier_th) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    binl = inl[best]

    # Refine on inliers (weighted by mask via replicating mean with weights).
    w = binl.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    mu1 = jnp.sum(p1 * w, 0) / denom
    mu2 = jnp.sum(p2 * w, 0) / denom
    c1 = (p1 - mu1) * w
    c2 = (p2 - mu2) * w
    W = c2.T @ c1
    U, S, Vt = jnp.linalg.svd(W)
    Dm = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(
        jnp.sign(jnp.linalg.det(U @ Vt))
    )
    Rr = U @ Dm @ Vt
    sr = jnp.where(
        fix_scale,
        1.0,
        jnp.sum(S * jnp.diag(Dm)) / jnp.maximum(jnp.sum(c1 * c1), 1e-12),
    )
    tr = mu2 - sr * Rr @ mu1
    pred = sr * p1 @ Rr.T + tr
    err = jnp.sum((pred - p2) ** 2, -1)
    inliers = (err < inlier_th) & valid
    return Sim3Result(
        R=Rr, t=tr, s=sr, inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )


def optimize_sim3_reprojection(
    T12_init: jnp.ndarray,  # [4, 4] camera1-from-camera2 (SE3; RGB-D fixes s=1)
    xc2: jnp.ndarray,  # [M, 3] matched points in camera-2 frame
    uv1: jnp.ndarray,  # [M, 2] observations in image 1 (undistorted)
    xc1: jnp.ndarray,  # [M, 3] matched points in camera-1 frame
    uv2: jnp.ndarray,  # [M, 2] observations in image 2
    inv_sigma2_1: jnp.ndarray,  # [M] octave information weights (image 1)
    inv_sigma2_2: jnp.ndarray,  # [M]
    valid: jnp.ndarray,  # [M] bool
    cam,
    iters: int = 10,
    chi2_th: float = 10.0,
    damping: float = 1e-4,
    fix_scale: bool = True,
    log_s_init: jnp.ndarray | float = 0.0,
):
    """Image-plane refinement of the loop-closure transform — the
    ``Optimizer::OptimizeSim3`` equivalent (``src/Optimizer.cc:1047``):
    bidirectional reprojection edges (point-2 through S12 into image 1,
    point-1 through S12^-1 into image 2) with Huber(sqrt(10)) and a
    final chi2 <= 10 inlier gate on BOTH edges, as Gauss-Newton over
    SE3 (``fix_scale=True``: RGB-D/stereo ``mbFixScale``,
    ``src/LoopClosing.cc:234``) or full 7-DoF Sim3 (monocular: the scale
    DoF rides a log-scale parameter, ``x1 = e^sigma R x2 + t``).

    Materially better than a 3D-point Horn refit when depth error
    dominates: image-plane residuals weight what the cameras actually
    measured. Returns (T12, log_s, inlier mask, n_inliers).
    """
    huber = jnp.sqrt(chi2_th)
    dof = 6 if fix_scale else 7

    def proj(xc):
        z = jnp.maximum(xc[:, 2], 1e-3)
        return jnp.stack(
            [cam.fx * xc[:, 0] / z + cam.cx, cam.fy * xc[:, 1] / z + cam.cy],
            -1,
        )

    def residuals(xi, T12, ls):
        T = se3_exp6(xi[:6]) @ T12
        s = jnp.exp(ls + (0.0 if fix_scale else xi[6]))
        Rm, tm = T[:3, :3], T[:3, 3]
        y1 = s * (xc2 @ Rm.T) + tm  # into camera 1 (x1 = s R x2 + t)
        r1 = proj(y1) - uv1
        # inverse transform into camera 2: x2 = (1/s) R^T (x1 - t)
        y2 = (xc1 - tm) @ Rm / s
        r2 = proj(y2) - uv2
        good = valid & (y1[:, 2] > 1e-2) & (y2[:, 2] > 1e-2)
        r = jnp.concatenate([r1, r2], axis=-1)  # [M, 4]
        return jnp.clip(r, -1e4, 1e4), good

    def chi2_of(r):
        c1 = inv_sigma2_1 * jnp.sum(r[:, :2] ** 2, -1)
        c2 = inv_sigma2_2 * jnp.sum(r[:, 2:] ** 2, -1)
        return c1, c2

    def it(_, carry):
        T12, ls = carry
        zero = jnp.zeros(dof, jnp.float32)
        (r, good), Jfn = (residuals(zero, T12, ls),
                          jax.jacfwd(lambda x: residuals(x, T12, ls)[0]))
        J = Jfn(zero)  # [M, 4, dof]
        c1, c2 = chi2_of(r)
        w1 = inv_sigma2_1 * _huber_w(c1, huber)
        w2 = inv_sigma2_2 * _huber_w(c2, huber)
        w = jnp.concatenate(
            [jnp.stack([w1, w1], -1), jnp.stack([w2, w2], -1)], -1
        )  # [M, 4]
        w = w * good[:, None]
        JtW = J * w[:, :, None]
        H = jnp.einsum("mri,mrj->ij", JtW, J) + damping * jnp.eye(dof)
        b = jnp.einsum("mri,mr->i", JtW, r)
        dx = -jnp.linalg.solve(H, b)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros(dof))
        T12 = se3_exp6(dx[:6]) @ T12
        if not fix_scale:
            ls = ls + dx[6]
        return T12, ls

    ls0 = jnp.asarray(log_s_init, jnp.float32)
    T12, ls = jax.lax.fori_loop(0, iters, it, (T12_init, ls0))
    r, good = residuals(jnp.zeros(dof, jnp.float32), T12, ls)
    c1, c2 = chi2_of(r)
    inl = good & (c1 <= chi2_th) & (c2 <= chi2_th)
    return T12, ls, inl, jnp.sum(inl.astype(jnp.int32))


def _huber_w(chi2, delta):
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)


def se3_exp6(xi: jnp.ndarray) -> jnp.ndarray:
    """exp of [rho, phi] twist -> [4, 4] (local import avoids a cycle)."""
    from gsorb_slam_tpu.core.transforms import se3_exp

    return se3_exp(xi)
