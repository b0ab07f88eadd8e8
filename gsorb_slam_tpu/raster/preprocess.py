"""Per-Gaussian EWA projection ("preprocess").

Vectorized jnp equivalent of ``preprocessCUDA`` + ``computeCov2D`` +
``computeCov3D`` (``cuda_rasterizer/forward.cu:74-256``): frustum cull,
perspective projection, 3D covariance from quaternion*scale, EWA 2D
covariance with the 0.3 pixel low-pass, conic inverse and 3-sigma radius.
One fused elementwise pass over the padded Gaussian arrays — XLA maps it
onto the VPU; there is no per-Gaussian thread grid to manage.

One deliberate correctness upgrade over the reference default path: the
reference's non-radius-filter mode rotates the *means* into the camera frame
on the torch side but rasterizes with an identity view matrix
(``src/Render.cc:750-752``), so world-frame covariances are never rotated
into the camera frame. Here ``cov_cam = R_cw cov_world R_cw^T`` always, which
matches the reference's own radius-filter path and is differentiable w.r.t.
the pose.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.transforms import quat_to_rotmat

HIGHEST = jax.lax.Precision.HIGHEST  # full-f32 contractions (TPU default is bf16)

NEAR_CULL = 0.2  # CUDA in_frustum: p_view.z <= 0.2 culled (auxiliary.h)
LOW_PASS = 0.3  # pixel low-pass added to cov2D diagonal (forward.cu:108-110)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Preprocessed:
    """Screen-space Gaussian attributes, padded to capacity C."""

    mean2d: jnp.ndarray  # [C, 2] pixel coords
    depth: jnp.ndarray  # [C] camera z (+inf for culled)
    conic: jnp.ndarray  # [C, 3] upper-triangular inverse cov2D (a, b, c)
    opacity: jnp.ndarray  # [C] sigmoid-activated
    color: jnp.ndarray  # [C, 3]
    radius: jnp.ndarray  # [C] float pixel radius (0 for culled)
    valid: jnp.ndarray  # [C] bool


def covariance_3d(quats: jnp.ndarray, log_scales: jnp.ndarray, scale_modifier: float) -> jnp.ndarray:
    """World-frame covariance ``R S S^T R^T`` [C, 3, 3] (forward.cu:118-152).

    Kept for reference/tests; the hot path below uses the scalar-expanded
    form — batched 3x3 einsums pad catastrophically on the MXU (measured
    ~17ms/iter in the mapping backward vs ~1ms scalar-expanded).
    """
    R = quat_to_rotmat(quats)
    s = jnp.exp(log_scales) * scale_modifier  # [C, 3]
    M = R * s[:, None, :]  # R @ diag(s)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=HIGHEST)


def preprocess(
    means: jnp.ndarray,
    rgb: jnp.ndarray,
    quats: jnp.ndarray,
    logit_opacities: jnp.ndarray,
    log_scales: jnp.ndarray,
    active: jnp.ndarray,
    T_cw: jnp.ndarray,
    cam: Camera,
    scale_modifier: float = 1.0,
) -> Preprocessed:
    R_cw = T_cw[:3, :3]
    t_cw = T_cw[:3, 3]
    p_cam = jnp.matmul(means, R_cw.T, precision=HIGHEST) + t_cw  # [C, 3]
    tx, ty, tz = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]

    in_front = tz > NEAR_CULL
    safe_z = jnp.where(in_front, tz, 1.0)

    # EWA Jacobian with the CUDA 1.3*tan_fov clamp (forward.cu:80-92).
    lim_x = 1.3 * cam.tan_half_fov_x
    lim_y = 1.3 * cam.tan_half_fov_y
    txz = jnp.clip(tx / safe_z, -lim_x, lim_x)
    tyz = jnp.clip(ty / safe_z, -lim_y, lim_y)

    # World covariance + camera rotation, SCALAR-EXPANDED (the einsum form
    # lowers to batched 3x3 matmuls that the MXU pads 40x; elementwise
    # columns stay on the VPU — same math as raster/instances.py).
    qw, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    qn = jnp.maximum(jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz), 1e-12)
    w_, xq, yq, zq = qw / qn, qx / qn, qy / qn, qz / qn
    r00 = 1 - 2 * (yq * yq + zq * zq)
    r01 = 2 * (xq * yq - w_ * zq)
    r02 = 2 * (xq * zq + w_ * yq)
    r10 = 2 * (xq * yq + w_ * zq)
    r11 = 1 - 2 * (xq * xq + zq * zq)
    r12 = 2 * (yq * zq - w_ * xq)
    r20 = 2 * (xq * zq - w_ * yq)
    r21 = 2 * (yq * zq + w_ * xq)
    r22 = 1 - 2 * (xq * xq + yq * yq)
    e0 = jnp.exp(log_scales[:, 0]) * scale_modifier
    e1 = jnp.exp(log_scales[:, 1]) * scale_modifier
    e2 = jnp.exp(log_scales[:, 2]) * scale_modifier
    v0, v1, v2 = e0 * e0, e1 * e1, e2 * e2
    c00 = r00 * r00 * v0 + r01 * r01 * v1 + r02 * r02 * v2
    c01 = r00 * r10 * v0 + r01 * r11 * v1 + r02 * r12 * v2
    c02 = r00 * r20 * v0 + r01 * r21 * v1 + r02 * r22 * v2
    c11 = r10 * r10 * v0 + r11 * r11 * v1 + r12 * r12 * v2
    c12 = r10 * r20 * v0 + r11 * r21 * v1 + r12 * r22 * v2
    c22 = r20 * r20 * v0 + r21 * r21 * v1 + r22 * r22 * v2
    # cov_cam = R_cw cov_w R_cw^T (row-expanded)
    m00 = R_cw[0, 0] * c00 + R_cw[0, 1] * c01 + R_cw[0, 2] * c02
    m01 = R_cw[0, 0] * c01 + R_cw[0, 1] * c11 + R_cw[0, 2] * c12
    m02 = R_cw[0, 0] * c02 + R_cw[0, 1] * c12 + R_cw[0, 2] * c22
    m10 = R_cw[1, 0] * c00 + R_cw[1, 1] * c01 + R_cw[1, 2] * c02
    m11 = R_cw[1, 0] * c01 + R_cw[1, 1] * c11 + R_cw[1, 2] * c12
    m12 = R_cw[1, 0] * c02 + R_cw[1, 1] * c12 + R_cw[1, 2] * c22
    m20 = R_cw[2, 0] * c00 + R_cw[2, 1] * c01 + R_cw[2, 2] * c02
    m21 = R_cw[2, 0] * c01 + R_cw[2, 1] * c11 + R_cw[2, 2] * c12
    m22 = R_cw[2, 0] * c02 + R_cw[2, 1] * c12 + R_cw[2, 2] * c22
    k00 = m00 * R_cw[0, 0] + m01 * R_cw[0, 1] + m02 * R_cw[0, 2]
    k01 = m00 * R_cw[1, 0] + m01 * R_cw[1, 1] + m02 * R_cw[1, 2]
    k02 = m00 * R_cw[2, 0] + m01 * R_cw[2, 1] + m02 * R_cw[2, 2]
    k11 = m10 * R_cw[1, 0] + m11 * R_cw[1, 1] + m12 * R_cw[1, 2]
    k12 = m10 * R_cw[2, 0] + m11 * R_cw[2, 1] + m12 * R_cw[2, 2]
    k22 = m20 * R_cw[2, 0] + m21 * R_cw[2, 1] + m22 * R_cw[2, 2]

    fx_z = cam.fx / safe_z
    fy_z = cam.fy / safe_z
    # J = [[fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]]
    j02 = -fx_z * txz
    j12 = -fy_z * tyz
    # cov2D = J cov_c J^T, expanded.
    a = fx_z * (fx_z * k00 + j02 * k02) + j02 * (fx_z * k02 + j02 * k22) + LOW_PASS
    b = fx_z * (fy_z * k01 + j12 * k02) + j02 * (fy_z * k12 + j12 * k22)
    c = fy_z * (fy_z * k11 + j12 * k12) + j12 * (fy_z * k12 + j12 * k22) + LOW_PASS

    det = a * c - b * b
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # radius = ceil(3 sqrt(max eigenvalue)) (forward.cu:176-181), further
    # tightened by opacity: alpha(d) = op * exp(-d^2 / (2 lam1)) falls below
    # the blend's 1/255 skip at d = sqrt(2 lam1 ln(255 op)), so low-opacity
    # splats get smaller tile footprints with zero output change (their
    # dropped pixels were discarded by the MIN_ALPHA test regardless).
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    op = jax.nn.sigmoid(logit_opacities)
    ln_term = jnp.log(jnp.maximum(255.0 * op, 1e-6))
    cutoff = jnp.sqrt(2.0 * lam1 * jnp.maximum(ln_term, 0.0))
    radius = jnp.ceil(jnp.minimum(3.0 * jnp.sqrt(lam1), cutoff))

    # Project the center UNCLAMPED: the CUDA 1.3*tan_fov clamp applies only
    # to the EWA Jacobian inputs; projecting through the clamped ratios would
    # draw/bin large splats centered beyond the clamp at a displaced center
    # (ADVICE r1).
    u = cam.fx * (tx / safe_z) + cam.cx
    v = cam.fy * (ty / safe_z) + cam.cy
    mean2d = jnp.stack([u, v], axis=-1)

    # visible: on-screen rect non-empty (CUDA computes the tile rect and
    # culls when empty; equivalent screen-bounds test here).
    on_screen = (
        (u + radius > 0)
        & (u - radius < cam.width)
        & (v + radius > 0)
        & (v - radius < cam.height)
    )
    # op < 1/255 can never pass the blend's alpha skip anywhere: cull.
    valid = active & in_front & det_ok & on_screen & (op >= 1.0 / 255.0)

    return Preprocessed(
        mean2d=mean2d,
        depth=jnp.where(valid, tz, jnp.inf),
        conic=conic,
        opacity=op,
        color=rgb,
        radius=jnp.where(valid, radius, 0.0),
        valid=valid,
    )
