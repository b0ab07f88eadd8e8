"""ORB feature extraction as vectorized JAX.

TPU-era rebuild of the reference's CPU hot path ``ORBextractor``
(``src/ORBextractor.cc``: 8-level 1.2x pyramid, two-threshold FAST-16 per
30px cell, spatial balancing, intensity-centroid orientation, 7x7 Gaussian
blur, 256-pair steered rBRIEF): every stage is dense array math (shifted
comparisons, convolutions, top-k, gathers) instead of per-pixel C++ loops.

Deviations (documented):
- spatial balancing uses per-cell top-response quotas + global top-k per
  level instead of the reference's sequential quad-tree
  (``DistributeOctTree``) — same intent (spread + response priority),
  order-of-selection differs;
- descriptor sampling uses the identical public 256-pair pattern
  (``brief_pattern.npy``, the OpenCV ``bit_pattern_31_`` table, BSD-3) so
  descriptors remain compatible with standard ORB vocabularies.

Outputs use fixed-capacity padded arrays (static shapes for jit).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.config import ORBConfig

EDGE = 19  # EDGE_THRESHOLD border exclusion (ORBextractor.cc)
PATCH_R = 15  # IC_Angle / descriptor patch radius (HALF_PATCH_SIZE)

# FAST-16 Bresenham circle offsets (dy, dx), clockwise from 12 o'clock.
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    np.int32,
)


@functools.lru_cache(maxsize=1)
def _pattern() -> np.ndarray:
    path = os.path.join(os.path.dirname(__file__), "brief_pattern.npy")
    return np.load(path)  # [256, 4] x1 y1 x2 y2


class ORBFeatures(NamedTuple):
    """Padded per-frame features (capacity ``N``, ``valid`` marks real rows)."""

    uv: jnp.ndarray  # [N, 2] level-0 pixel coords, UNDISTORTED when the
    #   camera has lens distortion (the reference's mvKeysUn — all matching,
    #   BA and reprojection consume these)
    response: jnp.ndarray  # [N]
    angle: jnp.ndarray  # [N] radians
    octave: jnp.ndarray  # [N] int32 pyramid level
    descriptors: jnp.ndarray  # [N, 8] uint32 (256-bit rBRIEF)
    valid: jnp.ndarray  # [N] bool
    uv_raw: jnp.ndarray = None  # [N, 2] raw (distorted) image coords — the
    #   reference's mvKeys; used ONLY for image-space lookups (depth at the
    #   keypoint). Equal to ``uv`` for distortion-free cameras.

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def _fast_response(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-16/9 corner response map (0 where not a corner).

    Score = max(sum of bright-arc diffs, sum of dark-arc diffs), the OpenCV
    nonmax-suppression score family.
    """
    diffs = jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) - img for dy, dx in _CIRCLE]
    )  # [16, H, W]
    bright = diffs > threshold
    dark = diffs < -threshold

    def has_arc9(m):
        a = m
        for s in range(1, 9):
            a = a & jnp.roll(m, -s, axis=0)
        return jnp.any(a, axis=0)

    is_corner = has_arc9(bright) | has_arc9(dark)
    sb = jnp.sum(jnp.where(bright, diffs - threshold, 0.0), axis=0)
    sd = jnp.sum(jnp.where(dark, -diffs - threshold, 0.0), axis=0)
    score = jnp.maximum(sb, sd)
    return jnp.where(is_corner, score, 0.0)


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


@functools.lru_cache(maxsize=4)
def _ic_kernels():
    """x- and y-weighted circular kernels for the intensity centroid."""
    r = PATCH_R
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    circ = (xs * xs + ys * ys) <= r * r
    kx = (xs * circ).astype(np.float32)
    ky = (ys * circ).astype(np.float32)
    return kx, ky


def _conv2(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        img[None, :, :, None],
        jnp.asarray(k)[:, :, None, None],
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]


@functools.lru_cache(maxsize=4)
def _gauss7():
    x = np.arange(7, dtype=np.float32) - 3
    g = np.exp(-(x**2) / (2 * 2.0**2))
    g /= g.sum()
    return np.outer(g, g)


def _extract_level(
    img: jnp.ndarray,
    n_keep: int,
    ini_th: float,
    min_th: float,
    cell: int = 32,
    per_cell: int = 8,
):
    """One pyramid level -> (uv [n_keep,2], response, angle, desc, valid)."""
    H, W = img.shape
    border = jnp.zeros((H, W), bool).at[EDGE:-EDGE, EDGE:-EDGE].set(True)

    r_ini = _nms3(_fast_response(img, ini_th)) * border
    r_min = _nms3(_fast_response(img, min_th)) * border

    # Two-threshold per-cell logic (src/ORBextractor.cc ComputeKeyPointsOctTree):
    # use ini-threshold detections where a cell has any, else min-threshold.
    Hc, Wc = H // cell, W // cell
    ri = r_ini[: Hc * cell, : Wc * cell].reshape(Hc, cell, Wc, cell)
    rm = r_min[: Hc * cell, : Wc * cell].reshape(Hc, cell, Wc, cell)
    has_ini = jnp.any(ri > 0, axis=(1, 3), keepdims=True)
    r_cell = jnp.where(has_ini, ri, rm)  # [Hc, cell, Wc, cell]

    # Spatial balancing: per-cell top 'per_cell', then global top n_keep.
    flat_cell = r_cell.transpose(0, 2, 1, 3).reshape(Hc * Wc, cell * cell)
    vals, idxs = jax.lax.top_k(flat_cell, per_cell)  # [cells, per_cell]
    cell_ids = jnp.arange(Hc * Wc, dtype=jnp.int32)[:, None]
    cy = cell_ids // Wc
    cx = cell_ids % Wc
    py = cy * cell + idxs // cell
    px = cx * cell + idxs % cell
    vals = vals.reshape(-1)
    py = py.reshape(-1)
    px = px.reshape(-1)
    top_vals, top_i = jax.lax.top_k(vals, min(n_keep, vals.shape[0]))
    ky = py[top_i]
    kx = px[top_i]
    valid = top_vals > 0

    # Orientation: intensity centroid via two dense convolutions.
    kxk, kyk = _ic_kernels()
    m10 = _conv2(img, kxk)
    m01 = _conv2(img, kyk)
    angle = jnp.arctan2(m01[ky, kx], m10[ky, kx])

    # Blur, then steered BRIEF.
    blurred = _conv2(img, _gauss7())
    pat = jnp.asarray(_pattern(), jnp.float32)  # [256, 4]
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]
    x1, y1, x2, y2 = pat[:, 0][None], pat[:, 1][None], pat[:, 2][None], pat[:, 3][None]
    # OpenCV steering: x' = round(x cos - y sin), y' = round(x sin + y cos)
    rx1 = jnp.round(x1 * ca - y1 * sa).astype(jnp.int32) + kx[:, None]
    ry1 = jnp.round(x1 * sa + y1 * ca).astype(jnp.int32) + ky[:, None]
    rx2 = jnp.round(x2 * ca - y2 * sa).astype(jnp.int32) + kx[:, None]
    ry2 = jnp.round(x2 * sa + y2 * ca).astype(jnp.int32) + ky[:, None]
    clampy = lambda a: jnp.clip(a, 0, H - 1)
    clampx = lambda a: jnp.clip(a, 0, W - 1)
    i1 = blurred[clampy(ry1), clampx(rx1)]  # [n_keep, 256]
    i2 = blurred[clampy(ry2), clampx(rx2)]
    bits = (i1 < i2).astype(jnp.uint32)  # [n_keep, 256]
    words = bits.reshape(-1, 8, 32)
    desc = jnp.sum(words << jnp.arange(32, dtype=jnp.uint32)[None, None, :], axis=-1)

    uv = jnp.stack([kx, ky], -1).astype(jnp.float32)
    return uv, top_vals, angle, desc.astype(jnp.uint32), valid


def extract_orb(
    gray: jnp.ndarray,  # [H, W] float32 in [0, 1]
    cfg: ORBConfig = ORBConfig(),
) -> ORBFeatures:
    """Full pyramid extraction; returns padded features of capacity
    ``cfg.n_features`` (level budgets follow the reference's geometric
    1/scaleFactor distribution, ``ORBextractor.cc`` ctor)."""
    H, W = gray.shape
    s = cfg.scale_factor
    # Per-level feature budget: n_l ~ n * (1-1/s)/(1-(1/s)^L) * (1/s)^l.
    inv = 1.0 / s
    weights = np.array([inv**l for l in range(cfg.n_levels)])
    budgets = np.round(cfg.n_features * weights / weights.sum()).astype(int)
    budgets[-1] = max(cfg.n_features - budgets[:-1].sum(), 8)

    uvs, rs, angs, descs, vals, octs = [], [], [], [], [], []
    img = gray
    for l in range(cfg.n_levels):
        scale = s**l
        if l > 0:
            h_l = int(round(H / scale))
            w_l = int(round(W / scale))
            img = jax.image.resize(gray, (h_l, w_l), "linear")
        uv, r, a, d, v = _extract_level(
            img,
            int(budgets[l]),
            cfg.ini_th_fast / 255.0,
            cfg.min_th_fast / 255.0,
        )
        uvs.append(uv * scale)
        rs.append(r)
        angs.append(a)
        descs.append(d)
        vals.append(v)
        octs.append(jnp.full(uv.shape[0], l, jnp.int32))

    uv = jnp.concatenate(uvs)
    return ORBFeatures(
        uv=uv,
        response=jnp.concatenate(rs),
        angle=jnp.concatenate(angs),
        octave=jnp.concatenate(octs),
        descriptors=jnp.concatenate(descs),
        valid=jnp.concatenate(vals),
        uv_raw=uv,
    )


def quadtree_refine(feats: ORBFeatures, cfg: ORBConfig = ORBConfig()) -> ORBFeatures:
    """Exact quad-tree spatial balancing over the per-level candidates using
    the native library (``native/gsorb_native.cpp``) — restores the
    reference's ``DistributeOctTree`` selection semantics on top of the
    vectorized extractor's per-cell top-k. No-op (top-k fallback keeps the
    jit selection) when the native library isn't built."""
    from gsorb_slam_tpu.frontend.native import have_native, quadtree_distribute

    if not have_native():
        return feats
    valid = np.array(feats.valid)
    uv = np.asarray(feats.uv)
    resp = np.asarray(feats.response)
    octv = np.asarray(feats.octave)
    s = cfg.scale_factor
    inv = 1.0 / s
    weights = np.array([inv**l for l in range(cfg.n_levels)])
    budgets = np.round(cfg.n_features * weights / weights.sum()).astype(int)
    for l in range(cfg.n_levels):
        sel = np.nonzero(valid & (octv == l))[0]
        if len(sel) <= budgets[l]:
            continue
        keep = quadtree_distribute(uv[sel, 0], uv[sel, 1], resp[sel], int(budgets[l]))
        valid[sel[~keep]] = False
    return feats._replace(valid=jnp.asarray(valid))


def level_sigma2(cfg: ORBConfig = ORBConfig()) -> np.ndarray:
    """Per-octave variance weights (``Frame::mvInvLevelSigma2`` source)."""
    return np.array([(cfg.scale_factor**l) ** 2 for l in range(cfg.n_levels)], np.float32)
