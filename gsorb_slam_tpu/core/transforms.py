"""Differentiable SE(3)/quaternion math.

TPU-native replacement for the reference's quaternion utilities
(``src/Utils.cc:170-179`` ``Rt2T`` and ``include/Utils.h:56-77``
``ToRotation``) and the cv::Mat/Eigen/g2o conversion shims
(``src/Converter.cc``). Everything here is pure ``jax.numpy`` so camera-pose
optimization can differentiate straight through the pose parameterization
(unnormalized quaternion + translation), exactly the leaves the reference
optimizes (``include/Gaussian.h:199-200``).

Conventions:
- quaternions are ``[w, x, y, z]``, unnormalized on input (normalized here),
- ``T_cw`` maps world points into the camera frame: ``x_c = R x_w + t``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# All geometry contractions run at full f32: the TPU default matmul
# precision is bf16, which is ~0.4% relative error — fatal for SLAM geometry.
HIGHEST = jax.lax.Precision.HIGHEST


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized quaternion(s) ``[..., 4]`` -> rotation matrix ``[..., 3, 3]``.

    Differentiable through the normalization, mirroring the reference's
    ``ToRotation`` (``include/Utils.h:56-77``) which the pose tracker
    backpropagates through.
    """
    q = normalize_quat(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``[..., 3, 3]`` -> unit quaternion ``[..., 4]`` (w>=0).

    Branchless Shepperd method (selects the numerically best of the four
    standard formulas) so it is safe under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per dominant diagonal.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(case), 4(comp)]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = normalize_quat(q[..., 0, :])
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions ``[..., 4]``."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def pose_to_matrix(quat: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(quat ``[...,4]``, trans ``[...,3]``) -> homogeneous ``T [..., 4, 4]``.

    Equivalent of the reference's ``Rt2T`` (``src/Utils.cc:170-179``): the
    differentiable bridge from the optimized pose leaves to the 4x4 transform
    used by the renderer.
    """
    R = quat_to_rotmat(quat)
    batch = jnp.broadcast_shapes(R.shape[:-2], trans.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(trans, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(T: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Homogeneous ``T [..., 4, 4]`` -> (unit quat ``[...,4]``, trans ``[...,3]``)."""
    return rotmat_to_quat(T[..., :3, :3]), T[..., :3, 3]


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid transform(s) ``[..., 4, 4]`` without a linear solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t, precision=HIGHEST)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply ``T [4,4]`` (or batched) to points ``[..., 3]``."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts, precision=HIGHEST) + T[..., None, :3, 3]


def so3_exp(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues: axis-angle ``[..., 3]`` -> rotation matrix ``[..., 3, 3]``.

    Used by the Gauss-Newton/LM pose solvers (the g2o ``SE3Quat::exp``
    equivalent, cf. ``Thirdparty/g2o`` SE3 vertices).
    """
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, eps)
    a = jnp.where(theta[..., None] > eps, jnp.sin(safe)[..., None] / safe[..., None], 1.0)
    b = jnp.where(
        theta[..., None] > eps,
        (1.0 - jnp.cos(safe))[..., None] / (safe * safe)[..., None],
        0.5,
    )
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * jnp.matmul(K, K, precision=HIGHEST)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """``[..., 3]`` -> skew-symmetric ``[..., 3, 3]``."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_log(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation matrix ``[..., 3, 3]`` -> axis-angle ``[..., 3]``."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    scale = jnp.where(
        theta[..., None] > eps, theta[..., None] / (2.0 * jnp.maximum(sin_t[..., None], eps)), 0.5
    )
    return w * scale


def se3_log(T: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Rigid transform ``[..., 4, 4]`` -> twist ``[..., 6]`` (rho, phi).

    ``eps`` gates the small-angle Taylor branch; in f32 the closed form
    ``(1 - theta sin/(2(1-cos)))/theta^2`` cancels catastrophically below
    ~1e-3 rad, so the branch threshold is deliberately wide.
    """
    phi = so3_log(T[..., :3, :3], eps)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, eps)
    K = skew(phi)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin/(2(1-cos))) K^2
    half_cot = jnp.where(
        theta[..., None] > eps,
        (1.0 - safe[..., None] * jnp.sin(safe)[..., None] / (2.0 * (1.0 - jnp.cos(safe))[..., None]))
        / (safe * safe)[..., None],
        1.0 / 12.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + half_cot * jnp.matmul(K, K, precision=HIGHEST)
    rho = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3], precision=HIGHEST)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_exp(xi: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """se(3) twist ``[..., 6]`` (rho, phi) -> ``T [..., 4, 4]``."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi, eps)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, eps)
    K = skew(phi)
    b = jnp.where(
        theta[..., None] > eps,
        (1.0 - jnp.cos(safe))[..., None] / (safe * safe)[..., None],
        0.5,
    )
    c = jnp.where(
        theta[..., None] > eps,
        ((safe - jnp.sin(safe)) / (safe**3))[..., None],
        1.0 / 6.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b * K + c * jnp.matmul(K, K, precision=HIGHEST)
    t = jnp.einsum("...ij,...j->...i", V, rho, precision=HIGHEST)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), xi.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
