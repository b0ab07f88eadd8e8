"""Pinhole camera model.

TPU-native replacement for the reference's ``Camera`` (``src/Camera.cc:7-52``),
which builds OpenGL-style view/projection matrices for the CUDA rasterizer.
The JAX renderer works directly in metric camera space (project with fx/fy,
cull with near/far), so the camera is just a static intrinsics pytree; poses
are passed separately as ``T_cw`` world->camera transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Static pinhole intrinsics. All fields are auxiliary (hashable) so a
    ``Camera`` can be a jit static argument."""

    fx: float = dataclasses.field(metadata=dict(static=True))
    fy: float = dataclasses.field(metadata=dict(static=True))
    cx: float = dataclasses.field(metadata=dict(static=True))
    cy: float = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    near: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    far: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    @property
    def tan_half_fov_x(self) -> float:
        # tanfov = dim / (2 f), cf. src/Camera.cc:19-20
        return self.width / (2.0 * self.fx)

    @property
    def tan_half_fov_y(self) -> float:
        return self.height / (2.0 * self.fy)

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def scaled(self, factor: float) -> "Camera":
        """Camera for a resolution scaled by ``factor`` (e.g. the reference's
        1.2x radius-filter pre-pass, ``src/Render.cc:784-831``)."""
        return Camera(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
            near=self.near,
            far=self.far,
        )

    @staticmethod
    def from_config(cfg: Any) -> "Camera":
        """Build from a config mapping with ``Camera.fx`` etc. keys (the
        reference reads the same YAML keys in ``src/Tracking.cc:57`` ff.)."""
        cam = cfg["Camera"] if "Camera" in cfg else cfg
        return Camera(
            fx=float(cam["fx"]),
            fy=float(cam["fy"]),
            cx=float(cam["cx"]),
            cy=float(cam["cy"]),
            width=int(cam["width"]),
            height=int(cam["height"]),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Distortion:
    """Brown-Conrady radial/tangential lens distortion (the reference's
    ``Camera.k1..k3/p1/p2`` YAML keys, consumed by
    ``Frame::UndistortKeyPoints`` via ``cv::undistortPoints``). All fields
    static so a ``Distortion`` can be a jit static argument."""

    k1: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    k2: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    p1: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    p2: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    k3: float = dataclasses.field(default=0.0, metadata=dict(static=True))

    def is_zero(self) -> bool:
        return self.k1 == self.k2 == self.p1 == self.p2 == self.k3 == 0.0


def distort_points(cam: Camera, dist: Distortion, uv: jnp.ndarray) -> jnp.ndarray:
    """Apply the forward distortion model to IDEAL pixel coords ``[..., 2]``:
    ideal (pinhole) -> observed (distorted) pixel coordinates."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    r2 = x * x + y * y
    radial = 1.0 + r2 * (dist.k1 + r2 * (dist.k2 + r2 * dist.k3))
    xd = x * radial + 2.0 * dist.p1 * x * y + dist.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + dist.p1 * (r2 + 2.0 * y * y) + 2.0 * dist.p2 * x * y
    return jnp.stack([cam.fx * xd + cam.cx, cam.fy * yd + cam.cy], axis=-1)


def undistort_points(
    cam: Camera, dist: Distortion, uv: jnp.ndarray, iters: int = 5
) -> jnp.ndarray:
    """Observed (distorted) pixel coords -> ideal pinhole pixel coords.

    Same fixed-point iteration as ``cv::undistortPoints`` (and therefore as
    the reference's ``Frame::UndistortKeyPoints``, ``src/Frame.cc``): start
    from the distorted normalized coords and repeatedly divide out the
    radial factor / subtract the tangential shift. ``iters=5`` matches
    OpenCV's iteration count exactly — with strong coefficients (TUM1's
    k2=-0.95, k3=1.16) the fixed point is NOT contractive at the extreme
    corners, so more iterations would diverge from the reference behavior.
    Validated against ``cv2.undistortPoints`` in tests (<1e-4 px at TUM1
    coefficients).
    """
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (dist.k1 + r2 * (dist.k2 + r2 * dist.k3))
        dx = 2.0 * dist.p1 * x * y + dist.p2 * (r2 + 2.0 * x * x)
        dy = dist.p1 * (r2 + 2.0 * y * y) + 2.0 * dist.p2 * x * y
        inv = 1.0 / jnp.maximum(radial, 1e-6)
        x = (xd - dx) * inv
        y = (yd - dy) * inv
    return jnp.stack([cam.fx * x + cam.cx, cam.fy * y + cam.cy], axis=-1)


def undistorted_image_bounds(
    cam: Camera, dist: Distortion
) -> tuple[float, float, float, float]:
    """(min_x, max_x, min_y, max_y) of the undistorted image rectangle —
    ``Frame::ComputeImageBounds`` (undistorts the 4 corners)."""
    import numpy as np

    corners = jnp.asarray(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        jnp.float32,
    )
    if dist.is_zero():
        return 0.0, float(cam.width), 0.0, float(cam.height)
    und = np.asarray(undistort_points(cam, dist, corners))
    return (
        float(min(und[0, 0], und[2, 0])),
        float(max(und[1, 0], und[3, 0])),
        float(min(und[0, 1], und[1, 1])),
        float(max(und[2, 1], und[3, 1])),
    )


def project_points(cam: Camera, pts_cam: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points ``[..., 3]`` -> pixel coords ``[..., 2]``, depth ``[...]``."""
    z = pts_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = cam.fx * pts_cam[..., 0] / safe_z + cam.cx
    v = cam.fy * pts_cam[..., 1] / safe_z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def backproject(cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords ``[..., 2]`` + depth ``[...]`` -> camera-frame points ``[..., 3]``.

    Vectorized equivalent of the reference's per-pixel backprojection loops
    (``src/Render.cc:666-707`` ``InitGaussianPoint`` and ``:617-655``
    ``ProjectPixel``).
    """
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def pixel_grid(cam: Camera, dtype=jnp.float32) -> jnp.ndarray:
    """Dense pixel-center coordinates ``[H, W, 2]`` (u=x, v=y)."""
    u = jnp.arange(cam.width, dtype=dtype)
    v = jnp.arange(cam.height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1)
