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
