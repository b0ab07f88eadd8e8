"""Approximate 3-nearest-neighbor mean squared distance.

Equivalent of the reference's ``simple_knn``/``distCUDA2``
(``src/simple_knn.cu:45-221``, ``src/spatial.cu:14-27``) used by the splat
scale initializers ``initScalarMethod`` 0/1 (``src/Gaussian.cc:59-72``).
The CUDA version Morton-sorts points into 1024-point boxes and rejects
boxes by bounds; the TPU version Morton-sorts and searches a +/-W window of
the sorted order — the same locality approximation, fully vectorized
(one sort + one windowed gather instead of per-point box walks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd position (Morton interleave helper)."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(pts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes of normalized points [N, 3]."""
    big = jnp.where(valid[:, None], pts, jnp.nan)
    lo = jnp.nanmin(big, axis=0)
    hi = jnp.nanmax(big, axis=0)
    span = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((pts - lo) / span * 1023.0), 0, 1023).astype(jnp.uint32)
    return (
        _expand_bits(q[:, 0])
        | (_expand_bits(q[:, 1]) << 1)
        | (_expand_bits(q[:, 2]) << 2)
    ).astype(jnp.uint32)


def knn3_mean_sq_dist(
    pts: jnp.ndarray,  # [N, 3]
    valid: jnp.ndarray,  # [N] bool
    window: int = 32,
) -> jnp.ndarray:
    """Mean squared distance to the (approximate) 3 nearest neighbors,
    per point. Invalid rows get 0."""
    N = pts.shape[0]
    codes = morton_codes(pts, valid)
    codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    sorted_pts = pts[order]
    sorted_valid = valid[order]

    # Window of +/-window sorted neighbors (excluding self).
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    ).astype(jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)[:, None] + offs[None, :]
    ok = (idx >= 0) & (idx < N)
    idx = jnp.clip(idx, 0, N - 1)
    nbr = sorted_pts[idx]  # [N, 2W, 3]
    ok = ok & sorted_valid[idx]
    d2 = jnp.sum((nbr - sorted_pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(ok, d2, jnp.inf)
    top3 = -jax.lax.top_k(-d2, 3)[0]  # 3 smallest (ties kept)
    mean3 = jnp.mean(top3, axis=1)
    # Fewer than 3 finite neighbors: fall back to the nearest one.
    d1 = top3[:, 0]
    mean3 = jnp.where(jnp.isfinite(mean3), mean3, jnp.where(jnp.isfinite(d1), d1, 0.0))
    # Undo the sort.
    out = jnp.zeros(N, pts.dtype).at[order].set(mean3)
    return jnp.where(valid, out, 0.0)


def knn3_mean_sq_dist_exact(
    pts: jnp.ndarray,  # [N, 3]
    valid: jnp.ndarray,  # [N] bool
) -> jnp.ndarray:
    """EXACT 3-NN mean squared distance (``src/simple_knn.cu:45-221``
    contract) via the native grid search through ``jax.pure_callback`` —
    jit-safe with static shapes. Falls back to the Morton-window
    approximation when the native library is unavailable."""
    from gsorb_slam_tpu.frontend.native import exact_knn3_native, have_native

    if not have_native():
        return knn3_mean_sq_dist(pts, valid)

    import numpy as np

    def _cb(p, v):
        out = exact_knn3_native(np.asarray(p), np.asarray(v))
        return np.asarray(out, np.float32)

    return jax.pure_callback(
        _cb,
        jax.ShapeDtypeStruct((pts.shape[0],), jnp.float32),
        pts, valid,
        vmap_method="sequential",
    )
