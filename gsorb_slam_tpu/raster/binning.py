"""Tile binning: which Gaussians touch which image tile, depth-ordered.

TPU-native replacement for the CUDA pipeline's
``InclusiveSum -> duplicateWithKeys -> RadixSort -> identifyTileRanges``
(``rasterizer_impl.cu:280-342``). Same algorithm, XLA primitives:

1. per-Gaussian tile rect (clamped to ``max_dup`` tiles) -> up to ``max_dup``
   (tile, depth, gaussian) instances each,
2. ONE ``lax.sort`` with lexicographic (tile, depth) keys over all C*D
   candidates (invalid slots carry a sentinel tile and sort to the tail —
   no compaction pass; scatter-based stream compaction measured 4x the
   cost of simply sorting the full candidate array),
3. per-tile ranges via ``searchsorted``, then a gather into fixed-capacity
   per-tile index lists.

Cost model (why this differs from CUDA): ``lax.sort`` on TPU costs ~10ms/M
keys, vs <1ms for the GPU radix sort. So bins are built ONCE per rendered
view and reused across all optimization iterations on that view (poses move
millimeters per Adam step; ``dilate_px`` absorbs the drift), instead of
re-binned every rasterization like the reference. Blending always uses the
*current* pose/params, so gradients stay exact; only culling and depth
ORDER can go slightly stale between re-binning episodes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster.preprocess import Preprocessed
from gsorb_slam_tpu.raster.types import RasterConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TileBins:
    indices: jnp.ndarray  # [T, cap] int32 gaussian ids, -1 padded
    counts: jnp.ndarray  # [T] int32 live entries per tile
    n_dropped: jnp.ndarray  # [] int32 instances lost to budget/cap overflow


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChunkBins:
    """Flat-chunk view of :class:`TileBins`: only the ceil(count/K) LIVE
    chunks of each tile are enumerated, concatenated across tiles.

    The per-tile fixed-capacity layout makes the mapping path gather/scatter
    T*cap instance rows per iteration regardless of the real instance count
    (~2.4x waste at VGA); this view bounds that work by the REAL count. Dead
    tail chunks carry tile id T (a padding tile) and index -1.
    """

    indices: jnp.ndarray  # [MC, K] int32 gaussian ids (-1 dead)
    chunk_tile: jnp.ndarray  # [MC] int32 owning tile (T = dead)
    chunk_pos: jnp.ndarray  # [MC] int32 chunk position within its tile
    n_chunks: jnp.ndarray  # [] int32 live chunk count


def chunk_layout(
    bins: TileBins, n_tiles: int, chunk: int, chunk_budget: int
) -> ChunkBins:
    """Build the flat-chunk enumeration from per-tile bins (amortized: once
    per binning episode, reused across all optimization iterations)."""
    K = chunk
    cap = bins.indices.shape[1]
    nchunks = (bins.counts + K - 1) // K  # [T]
    cstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)]
    )  # [T+1]
    total = cstart[-1]
    cid = jnp.arange(chunk_budget, dtype=jnp.int32)
    tile_of = (
        jnp.searchsorted(cstart, cid, side="right").astype(jnp.int32) - 1
    )
    live = cid < total
    tile_of = jnp.where(live, tile_of, n_tiles)
    pos = jnp.where(live, cid - cstart[jnp.minimum(tile_of, n_tiles - 1)], 0)
    flat = bins.indices.reshape(-1)
    base = jnp.minimum(tile_of, n_tiles - 1) * cap + pos * K  # [MC]
    src = base[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]  # [MC, K]
    idx = jnp.where(
        live[:, None], flat[jnp.minimum(src, n_tiles * cap - 1)], -1
    )
    return ChunkBins(
        indices=idx, chunk_tile=tile_of, chunk_pos=pos,
        n_chunks=total.astype(jnp.int32),
    )


def tile_grid_shape(cam: Camera, cfg: RasterConfig) -> tuple[int, int]:
    return (-(-cam.height // cfg.tile_h_px), -(-cam.width // cfg.tile_w_px))


def gaussian_tile_rect(
    prep: Preprocessed, cam: Camera, cfg: RasterConfig
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clamped tile rect per Gaussian: (start_x, start_y, w, h) in tiles.

    CUDA ``getRect`` semantics (``auxiliary.h``), additionally clamped to at
    most ``max_dup`` tiles centered on the mean's own tile (static instance
    shapes). A Gaussian contributes ONLY within this rect — matching CUDA,
    where alpha can be above 1/255 slightly beyond the 3-sigma radius but
    pixels of non-rect tiles never see the splat. The oracle renderer applies
    the same rect so all implementations agree bit-for-bit.
    """
    ty, tx = tile_grid_shape(cam, cfg)
    u = prep.mean2d[:, 0]
    v = prep.mean2d[:, 1]
    r = prep.radius + cfg.dilate_px
    D = cfg.max_dup

    tw, th = cfg.tile_w_px, cfg.tile_h_px
    x0 = jnp.clip(jnp.floor((u - r) / tw), 0, tx).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((u + r) / tw) + 1, 0, tx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((v - r) / th), 0, ty).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((v + r) / th) + 1, 0, ty).astype(jnp.int32)
    w = x1 - x0
    h = y1 - y0

    cw = jnp.minimum(w, D)
    ch = jnp.minimum(h, jnp.maximum(D // jnp.maximum(cw, 1), 1))
    cx_t = jnp.clip((u / tw).astype(jnp.int32), 0, tx - 1)
    cy_t = jnp.clip((v / th).astype(jnp.int32), 0, ty - 1)
    sx = jnp.clip(cx_t - cw // 2, x0, jnp.maximum(x1 - cw, x0))
    sy = jnp.clip(cy_t - ch // 2, y0, jnp.maximum(y1 - ch, y0))
    return sx, sy, cw, ch


def bin_gaussians(
    prep: Preprocessed,
    cam: Camera,
    cfg: RasterConfig,
    instance_budget: int | None = None,  # kept for API compat; unused
) -> TileBins:
    C = prep.depth.shape[0]
    ty, tx = tile_grid_shape(cam, cfg)
    n_tiles = ty * tx
    D = cfg.max_dup

    sx, sy, cw, ch = gaussian_tile_rect(prep, cam, cfg)

    d = jnp.arange(D, dtype=jnp.int32)
    dx = d[None, :] % jnp.maximum(cw, 1)[:, None]
    dy = d[None, :] // jnp.maximum(cw, 1)[:, None]
    dup_ok = (d[None, :] < cw[:, None] * ch[:, None]) & prep.valid[:, None]
    tile_x = sx[:, None] + dx
    tile_y = sy[:, None] + dy
    # Conic-rect cull: the blend skips every (pixel, splat) pair with
    # alpha < 1/255 (MIN_ALPHA, forward.cu:316-321), so a tile where even
    # the MINIMUM of the conic quadratic q(d) = A du^2 + 2B du dv + C dv^2
    # over the (dilate-expanded) tile rect satisfies op*exp(-q/2) < 1/255
    # contributes nothing anywhere — dropping it cannot change any
    # renderer's output. The exact rect-constrained minimum of the PD
    # quadratic is 0 if the mean lies inside the rect, else the best of
    # the four edge restrictions (each a clamped 1D quadratic). This is
    # strictly tighter than a circle test for anisotropic / low-opacity
    # splats (the bbox is built from the MAX eigenvalue) — measured ~20%
    # fewer instances on the VGA bench with zero output deviation; the
    # 1.44x q margin (= the old 1.2x distance margin, squared) plus the
    # dilate expansion cover pose drift between binning episodes.
    u = prep.mean2d[:, 0][:, None]
    v = prep.mean2d[:, 1][:, None]
    dil = float(cfg.dilate_px)
    cx0 = tile_x.astype(jnp.float32) * cfg.tile_w_px
    cy0 = tile_y.astype(jnp.float32) * cfg.tile_h_px
    ulo, uhi = cx0 - dil - u, cx0 + cfg.tile_w_px + dil - u
    vlo, vhi = cy0 - dil - v, cy0 + cfg.tile_h_px + dil - v
    A = jnp.maximum(prep.conic[:, 0], 1e-12)[:, None]
    Bc = prep.conic[:, 1][:, None]
    Cc = jnp.maximum(prep.conic[:, 2], 1e-12)[:, None]

    def _q(du, dv):
        return A * du * du + 2.0 * Bc * du * dv + Cc * dv * dv

    def _edge_u(ufix):  # min over dv in [vlo, vhi] at du = ufix
        return _q(ufix, jnp.clip(-Bc * ufix / Cc, vlo, vhi))

    def _edge_v(vfix):  # min over du in [ulo, uhi] at dv = vfix
        return _q(jnp.clip(-Bc * vfix / A, ulo, uhi), vfix)

    inside = (ulo <= 0.0) & (uhi >= 0.0) & (vlo <= 0.0) & (vhi >= 0.0)
    q_min = jnp.minimum(
        jnp.minimum(_edge_u(ulo), _edge_u(uhi)),
        jnp.minimum(_edge_v(vlo), _edge_v(vhi)),
    )
    q_min = jnp.where(inside, 0.0, q_min)
    q_max = 2.0 * jnp.log(jnp.maximum(255.0 * prep.opacity, 1.0))[:, None]
    dup_ok = dup_ok & (q_min <= 1.44 * q_max)
    tile_id = jnp.where(dup_ok, tile_y * tx + tile_x, n_tiles).astype(jnp.int32)

    # --- one lexicographic (tile, depth) sort over ALL C*D candidates =
    # CUDA's 64-bit-key radix sort (invalid slots carry the sentinel tile
    # n_tiles and sort to the tail). Sorting the full candidate array beats
    # the r1 stream-compaction: the cumsum+three-scatter compaction alone
    # cost ~40ms at VGA scale vs ~10ms for this sort.
    flat_tile = tile_id.reshape(-1)
    flat_gid = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[:, None], (C, D)
    ).reshape(-1)
    flat_depth = jnp.where(
        dup_ok, jnp.broadcast_to(prep.depth[:, None], (C, D)), jnp.inf
    ).reshape(-1)
    s_tile, _, s_gid = jax.lax.sort([flat_tile, flat_depth, flat_gid], num_keys=2)

    # --- per-tile ranges (identifyTileRanges equivalent) ---
    tid = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tid, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tid + 1, side="left").astype(jnp.int32)
    counts = jnp.minimum(ends - starts, cfg.tile_capacity)
    n_over_cap = jnp.sum(ends - starts - counts)

    k = jnp.arange(cfg.tile_capacity, dtype=jnp.int32)
    gather_pos = starts[:, None] + k[None, :]
    live = k[None, :] < counts[:, None]
    idx = jnp.where(
        live,
        s_gid[jnp.minimum(gather_pos, C * D - 1)],
        -1,
    )
    return TileBins(indices=idx, counts=counts, n_dropped=n_over_cap)
