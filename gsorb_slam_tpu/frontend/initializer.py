"""Monocular bootstrap: parallel homography/fundamental RANSAC.

Rebuild of the reference ``Initializer`` (``src/Initializer.cc:46-935``):
score a homography and a fundamental matrix over batched RANSAC hypotheses
simultaneously, pick the model by the reference's ``RH = SH/(SH+SF) > 0.40``
rule, decompose to (R, t), and select the motion hypothesis by cheirality +
parallax of the triangulated points. All hypothesis math is batched jnp
(one SVD per hypothesis batch instead of the reference's per-iteration
loops).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

CHI2_F = 3.841  # 1-DoF epipolar distance gate
CHI2_H = 5.991  # 2-DoF transfer error gate
TH_SCORE = 5.991


def _normalize(pts: jnp.ndarray):
    mu = jnp.mean(pts, axis=0)
    d = jnp.mean(jnp.abs(pts - mu), axis=0)
    s = 1.0 / jnp.maximum(d, 1e-8)
    T = jnp.array(
        [[s[0], 0, -mu[0] * s[0]], [0, s[1], -mu[1] * s[1]], [0, 0, 1.0]]
    )
    return (pts - mu) * s, T


def _homog(p):
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def compute_f_batch(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Normalized 8-point fundamental for batched samples [H, 8, 2] x2."""

    def one(a, b):
        A = jnp.stack(
            [
                b[:, 0] * a[:, 0], b[:, 0] * a[:, 1], b[:, 0],
                b[:, 1] * a[:, 0], b[:, 1] * a[:, 1], b[:, 1],
                a[:, 0], a[:, 1], jnp.ones_like(a[:, 0]),
            ],
            axis=-1,
        )
        _, _, Vt = jnp.linalg.svd(A)
        F = Vt[-1].reshape(3, 3)
        U, S, Vt2 = jnp.linalg.svd(F)
        return U @ jnp.diag(S.at[2].set(0.0)) @ Vt2

    return jax.vmap(one)(p1, p2)


def compute_h_batch(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """DLT homography for batched 4-point samples."""

    def one(a, b):
        def rows(pa, pb):
            x, y = pa
            u, v = pb
            return jnp.array(
                [
                    [-x, -y, -1, 0, 0, 0, u * x, u * y, u],
                    [0, 0, 0, -x, -y, -1, v * x, v * y, v],
                ]
            )

        A = jnp.concatenate([rows(a[i], b[i]) for i in range(4)], axis=0)
        _, _, Vt = jnp.linalg.svd(A)
        return Vt[-1].reshape(3, 3)

    return jax.vmap(one)(p1, p2)


def score_f(F, p1, p2):
    """Symmetric epipolar chi^2 score (``CheckFundamental``)."""
    x1 = _homog(p1)
    x2 = _homog(p2)
    l2 = jnp.einsum("hij,nj->hni", F, x1)  # lines in image 2
    l1 = jnp.einsum("hji,nj->hni", F, x2)  # lines in image 1
    d2 = jnp.sum(l2 * x2[None], -1) ** 2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12
    )
    d1 = jnp.sum(l1 * x1[None], -1) ** 2 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12
    )
    inl = (d1 < CHI2_F) & (d2 < CHI2_F)
    score = jnp.where(d1 < CHI2_F, TH_SCORE - d1, 0.0) + jnp.where(
        d2 < CHI2_F, TH_SCORE - d2, 0.0
    )
    return jnp.sum(score, -1), inl


def score_h(H, p1, p2):
    """Symmetric transfer chi^2 score (``CheckHomography``)."""
    x1 = _homog(p1)
    x2 = _homog(p2)
    Hx1 = jnp.einsum("hij,nj->hni", H, x1)
    Hinv = jnp.linalg.inv(H)
    Hx2 = jnp.einsum("hij,nj->hni", Hinv, x2)
    p21 = Hx1[..., :2] / jnp.where(
        jnp.abs(Hx1[..., 2:]) < 1e-12, 1e-12, Hx1[..., 2:]
    )
    p12 = Hx2[..., :2] / jnp.where(
        jnp.abs(Hx2[..., 2:]) < 1e-12, 1e-12, Hx2[..., 2:]
    )
    d2 = jnp.sum((p21 - p2[None]) ** 2, -1)
    d1 = jnp.sum((p12 - p1[None]) ** 2, -1)
    inl = (d1 < CHI2_H) & (d2 < CHI2_H)
    score = jnp.where(d1 < CHI2_H, TH_SCORE - d1, 0.0) + jnp.where(
        d2 < CHI2_H, TH_SCORE - d2, 0.0
    )
    return jnp.sum(score, -1), inl


def triangulate(P1, P2, p1, p2):
    """DLT triangulation [N] points given projection matrices [3,4]."""

    def one(a, b):
        A = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(one)(p1, p2)


class InitResult(NamedTuple):
    T_cw2: np.ndarray  # pose of frame 2 (frame 1 = identity)
    points: np.ndarray  # [N, 3] triangulated (inliers only meaningful)
    inliers: np.ndarray  # [N] bool
    model: str  # "H" or "F"


def initialize_monocular(
    uv1: np.ndarray,  # [N, 2] matched keypoints frame 1
    uv2: np.ndarray,  # [N, 2] matched keypoints frame 2
    K: np.ndarray,  # [3, 3] intrinsics
    seed: int = 0,
    n_hyp: int = 200,
    min_inliers: int = 50,
    min_parallax_deg: float = 1.0,
) -> Optional[InitResult]:
    """Full monocular bootstrap (``Initializer::Initialize``)."""
    N = len(uv1)
    if N < 30:
        return None
    key = jax.random.PRNGKey(seed)
    p1 = jnp.asarray(uv1, jnp.float32)
    p2 = jnp.asarray(uv2, jnp.float32)
    n1, T1 = _normalize(p1)
    n2, T2 = _normalize(p2)

    kf, kh = jax.random.split(key)
    idx_f = jax.random.randint(kf, (n_hyp, 8), 0, N)
    idx_h = jax.random.randint(kh, (n_hyp, 4), 0, N)

    Fn = compute_f_batch(n1[idx_f], n2[idx_f])
    F = jnp.einsum("ji,hjk,kl->hil", T2, Fn, T1)  # denormalize: T2^T Fn T1
    sf, inl_f = score_f(F, p1, p2)
    Hn = compute_h_batch(n1[idx_h], n2[idx_h])
    H = jnp.einsum("ij,hjk,kl->hil", jnp.linalg.inv(T2), Hn, T1)
    sh, inl_h = score_h(H, p1, p2)

    bf = int(jnp.argmax(sf))
    bh = int(jnp.argmax(sh))
    SF = float(sf[bf])
    SH = float(sh[bh])
    rh = SH / max(SH + SF, 1e-9)

    Kj = jnp.asarray(K, jnp.float32)
    if rh > 0.40:
        model = "H"
        cand_RT = _decompose_h(np.asarray(H[bh]), K)
        inliers = np.asarray(inl_h[bh])
    else:
        model = "F"
        E = Kj.T @ F[bf] @ Kj
        cand_RT = _decompose_e(np.asarray(E))
        inliers = np.asarray(inl_f[bf])

    if inliers.sum() < min_inliers:
        return None

    # Cheirality: pick the (R, t) with the most triangulated points in front
    # of both cameras with sufficient parallax (``CheckRT``).
    Kn = np.asarray(K, np.float32)
    P1 = Kn @ np.hstack([np.eye(3), np.zeros((3, 1))])
    best = None
    for R, t in cand_RT:
        P2 = Kn @ np.hstack([R, t.reshape(3, 1)])
        X = np.asarray(triangulate(jnp.asarray(P1), jnp.asarray(P2), p1, p2))
        z1 = X[:, 2]
        Xc2 = X @ R.T + t
        z2 = Xc2[:, 2]
        finite = np.isfinite(X).all(axis=1)
        good = inliers & finite & (z1 > 0) & (z2 > 0) & (np.abs(z1) < 1e4)
        # parallax
        c2 = -R.T @ t
        r1 = X
        r2 = X - c2
        cosp = np.sum(r1 * r2, -1) / np.maximum(
            np.linalg.norm(r1, axis=-1) * np.linalg.norm(r2, axis=-1), 1e-12
        )
        par = np.degrees(np.arccos(np.clip(cosp, -1, 1)))
        good_par = good & (par > 0.2)
        n_good = int(good_par.sum())
        med_par = float(np.median(par[good_par])) if n_good else 0.0
        if best is None or n_good > best[0]:
            best = (n_good, R, t, X, good_par, med_par)

    n_good, R, t, X, good, med_par = best
    if n_good < min_inliers or med_par < min_parallax_deg * 0.2:
        return None
    # Normalize scale: median scene depth = 1 (monocular gauge).
    med_z = np.median(X[good, 2])
    if med_z <= 0:
        return None
    X = X / med_z
    t = t / med_z
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return InitResult(T_cw2=T, points=X.astype(np.float32), inliers=good, model=model)


def _decompose_e(E: np.ndarray):
    U, _, Vt = np.linalg.svd(E)
    if np.linalg.det(U) < 0:
        U = -U
    if np.linalg.det(Vt) < 0:
        Vt = -Vt
    W = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / max(np.linalg.norm(t), 1e-12)
    return [(R1, t), (R1, -t), (R2, t), (R2, -t)]


def _decompose_h(H: np.ndarray, K: np.ndarray):
    """Faugeras-lite homography decomposition: return candidate (R, t) set.

    Uses the SVD-based method; sufficient for the cheirality selection that
    follows (the reference enumerates 8 Faugeras solutions;
    ``Initializer::ReconstructH``)."""
    A = np.linalg.inv(K) @ H @ K
    U, S, Vt = np.linalg.svd(A)
    A = A / S[1]
    # Candidates via the two-plane decomposition.
    out = []
    U, S, Vt = np.linalg.svd(A)
    d1, d2, d3 = S
    if d1 / d2 < 1.0001 or d2 / d3 < 1.0001:
        # Pure rotation-ish: R = A orthonormalized, t = 0 won't triangulate;
        # still return it to let cheirality reject.
        Uq, _, Vq = np.linalg.svd(A)
        out.append((Uq @ Vq, np.zeros(3)))
        return out
    s = np.linalg.det(U) * np.linalg.det(Vt)
    x1 = np.sqrt((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3))
    x3 = np.sqrt((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3))
    for e1 in (1, -1):
        for e3 in (1, -1):
            st = (
                e1 * e3 * np.sqrt((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3))
                / ((d1 + d3) * d2)
            )
            ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
            Rp = np.array([[ct, 0, -st], [0, 1, 0], [st, 0, ct]])
            R = s * U @ Rp @ Vt
            tp = (d1 - d3) * np.array([e1 * x1, 0, -e3 * x3])
            t = U @ tp
            n = np.linalg.norm(t)
            if n > 1e-9:
                t = t / n
            out.append((R, t))
            out.append((R, -t))
    return out
