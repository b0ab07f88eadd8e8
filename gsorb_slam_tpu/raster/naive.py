"""Dense reference renderer — the correctness oracle.

O(N * pixels) front-to-back alpha blending with bit-level fidelity to the
CUDA tile renderer's semantics (``renderCUDA`` ``forward.cu:261-401``):

- alpha = min(0.99, opacity * exp(power)), skipped if power > 0 or
  alpha < 1/255,
- a pixel stops accepting contributions once ``T * (1-alpha) < 1e-4``
  (the contribution that would cross the threshold is NOT applied),
- median depth = z of the last contributor seen while ``T > 0.5``,
- ``out_color = C + T * bg``.

Used to validate the production tiled/Pallas renderers and (with autodiff)
their gradients. Differentiable; the median-depth output carries
``stop_gradient`` for parity with the CUDA binding, which drops
``out_depth``'s gradient (``include/Rasterizer.cuh:209-212``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera, pixel_grid
from gsorb_slam_tpu.raster.binning import gaussian_tile_rect
from gsorb_slam_tpu.raster.preprocess import Preprocessed
from gsorb_slam_tpu.raster.types import RasterConfig, RenderOutput

MIN_ALPHA = 1.0 / 255.0
STOP_T = 1e-4


def render_naive(
    prep: Preprocessed,
    cam: Camera,
    bg: jnp.ndarray | float = 0.0,
    cfg: RasterConfig = RasterConfig(),
) -> RenderOutput:
    order = jnp.argsort(prep.depth)  # +inf (culled) sorts to the back
    mean2d = prep.mean2d[order]
    conic = prep.conic[order]
    opacity = prep.opacity[order]
    color = prep.color[order]
    depth = jnp.where(prep.valid, prep.depth, 0.0)[order]
    valid = prep.valid[order]
    sx, sy, cw, ch = gaussian_tile_rect(prep, cam, cfg)
    rect = jnp.stack([sx, sy, cw, ch], axis=-1)[order]

    uv = pixel_grid(cam)  # [H, W, 2]
    # Pixel tile coordinates: a Gaussian only touches pixels of tiles inside
    # its (clamped) rect — CUDA semantics; see gaussian_tile_rect.
    ptx = (uv[..., 0] / cfg.tile_w_px).astype(jnp.int32)
    pty = (uv[..., 1] / cfg.tile_h_px).astype(jnp.int32)
    H, W = cam.height, cam.width

    def step(carry, g):
        T, C, D, S, Med, done = carry
        m2d, con, op, col, z, ok, rc = g
        d = m2d[None, None, :] - uv  # [H, W, 2]
        power = (
            -0.5 * (con[0] * d[..., 0] ** 2 + con[2] * d[..., 1] ** 2)
            - con[1] * d[..., 0] * d[..., 1]
        )
        in_rect = (
            (ptx >= rc[0])
            & (ptx < rc[0] + rc[2])
            & (pty >= rc[1])
            & (pty < rc[1] + rc[3])
        )
        alpha = jnp.minimum(0.99, op * jnp.exp(power))
        contrib = ok & in_rect & (power <= 0.0) & (alpha >= MIN_ALPHA) & ~done
        test_T = T * (1.0 - alpha)
        crosses = contrib & (test_T < STOP_T)
        done = done | crosses
        apply = contrib & ~crosses
        w = jnp.where(apply, alpha * T, 0.0)
        C = C + w[..., None] * col
        D = D + w * z
        S = S + w
        Med = jnp.where(apply & (T > 0.5), z, Med)
        T = jnp.where(apply, test_T, T)
        return (T, C, D, S, Med, done), None

    dt = prep.mean2d.dtype  # follows x64 mode in gradient-check tests
    T0 = jnp.ones((H, W), dt)
    C0 = jnp.zeros((H, W, 3), dt)
    Z0 = jnp.zeros((H, W), dt)
    init = (T0, C0, Z0, Z0, Z0, jnp.zeros((H, W), bool))
    (T, C, D, S, Med, _), _ = jax.lax.scan(
        step, init, (mean2d, conic, opacity, color, depth, valid, rect)
    )
    bg = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (3,))
    return RenderOutput(
        color=C + T[..., None] * bg,
        depth=D,
        alpha=S,
        median_depth=jax.lax.stop_gradient(Med),
        final_t=T,
        radii=prep.radius,
    )
