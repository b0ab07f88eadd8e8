"""Tiled alpha-blend renderer (XLA version).

The production render path: per-tile fixed-capacity instance lists from
:mod:`binning`, then chunked front-to-back compositing where the color
accumulation is an MXU matmul ``weights[px, K] @ colors[K, 3]`` per chunk.
Matches ``renderCUDA`` (``forward.cu:261-401``) semantics exactly when bins
are fresh (validated against :func:`raster.naive.render_naive` in tests);
with stale (cached) bins only culling/order are stale — the math still uses
current params, so gradients remain exact.

This file is pure jnp so it runs on CPU in tests and anywhere without
Mosaic; the Pallas kernel (``pallas_raster.py``) implements the same
contract with VMEM-resident accumulators and per-tile dynamic trip counts.
Gradients come from XLA autodiff: the per-tile gather's backward is the
scatter-add that ``BACKWARD::render`` (``backward.cu:399-556``) hand-rolls
with atomics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster.binning import TileBins, bin_gaussians, tile_grid_shape
from gsorb_slam_tpu.raster.naive import MIN_ALPHA, STOP_T
from gsorb_slam_tpu.raster.preprocess import Preprocessed, preprocess
from gsorb_slam_tpu.raster.types import RasterConfig, RenderOutput


def render_tiled(
    prep: Preprocessed,
    bins: TileBins,
    cam: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray | float = 0.0,
) -> RenderOutput:
    ty, tx = tile_grid_shape(cam, cfg)
    n_tiles = ty * tx
    tsx, tsy = cfg.tile_w_px, cfg.tile_h_px
    px = tsx * tsy
    cap = bins.indices.shape[1]
    K = min(cfg.chunk, cap)
    assert cap % K == 0, "tile_capacity must be a multiple of chunk"

    # Per-tile pixel coordinates [T, px, 2].
    lu, lv = jnp.meshgrid(
        jnp.arange(tsx, dtype=jnp.float32),
        jnp.arange(tsy, dtype=jnp.float32), indexing="xy",
    )
    local = jnp.stack([lu, lv], axis=-1).reshape(px, 2)
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    origin = jnp.stack(
        [(t_ids % tx) * tsx, (t_ids // tx) * tsy], axis=-1
    ).astype(jnp.float32)
    pix = origin[:, None, :] + local[None, :, :]  # [T, px, 2]

    # Gather per-tile instance attributes (backward = scatter-add).
    safe_idx = jnp.maximum(bins.indices, 0)  # [T, cap]
    g_mean = prep.mean2d[safe_idx]  # [T, cap, 2]
    g_conic = prep.conic[safe_idx]  # [T, cap, 3]
    g_op = prep.opacity[safe_idx]  # [T, cap]
    g_col = prep.color[safe_idx]  # [T, cap, 3]
    g_z = prep.depth[safe_idx]  # [T, cap]
    k_iota = jnp.arange(cap, dtype=jnp.int32)
    g_live = (k_iota[None, :] < bins.counts[:, None]) & prep.valid[safe_idx]
    g_z = jnp.where(g_live, g_z, 0.0)  # keep inf out of the blend math

    kk = jnp.arange(K, dtype=jnp.int32)

    def chunk_step(carry, inputs):
        T, C, Dd, S, Med, done = carry
        m2d, con, op, col, z, live = inputs
        d0 = m2d[:, None, :, 0] - pix[..., 0:1]  # [T, px, K]
        d1 = m2d[:, None, :, 1] - pix[..., 1:2]
        power = (
            -0.5 * (con[:, None, :, 0] * d0 * d0 + con[:, None, :, 2] * d1 * d1)
            - con[:, None, :, 1] * d0 * d1
        )
        alpha = jnp.minimum(0.99, op[:, None, :] * jnp.exp(power))
        contrib = (
            live[:, None, :] & (power <= 0.0) & (alpha >= MIN_ALPHA) & ~done[..., None]
        )
        alpha = jnp.where(contrib, alpha, 0.0)
        # Exclusive prefix transmittance within the chunk.
        log1m = jnp.log1p(-jnp.minimum(alpha, 0.999999))
        T_pref = T[..., None] * jnp.exp(
            jnp.cumsum(log1m, axis=-1) - log1m
        )  # [T, px, K]
        crosses = contrib & (T_pref * (1.0 - alpha) < STOP_T)
        blocked = jnp.cumsum(crosses.astype(jnp.int32), axis=-1) > 0
        apply = contrib & ~blocked
        w = jnp.where(apply, alpha * T_pref, 0.0)
        # MXU: color accumulation as a batched matmul.
        C = C + jax.lax.dot_general(
            w,
            col,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        Dd = Dd + jnp.einsum("tpk,tk->tp", w, z, precision=jax.lax.Precision.HIGHEST)
        S = S + jnp.sum(w, axis=-1)
        # Median depth: z of LAST applied instance with T_pref > 0.5.
        is_med = apply & (T_pref > 0.5)
        last = jnp.max(jnp.where(is_med, kk[None, None, :] + 1, 0), axis=-1)
        onehot = (kk[None, None, :] + 1) == last[..., None]
        z_sel = jnp.sum(jnp.where(onehot, z[:, None, :], 0.0), axis=-1)
        Med = jnp.where(last > 0, z_sel, Med)
        T = T * jnp.exp(jnp.sum(jnp.where(apply, log1m, 0.0), axis=-1))
        done = done | jnp.any(crosses, axis=-1)
        return (T, C, Dd, S, Med, done), None

    n_chunks = cap // K
    resh = lambda a: jnp.moveaxis(
        a.reshape((n_tiles, n_chunks, K) + a.shape[2:]), 1, 0
    )
    xs = (resh(g_mean), resh(g_conic), resh(g_op), resh(g_col), resh(g_z), resh(g_live))

    T0 = jnp.ones((n_tiles, px), jnp.float32)
    init = (
        T0,
        jnp.zeros((n_tiles, px, 3), jnp.float32),
        jnp.zeros((n_tiles, px), jnp.float32),
        jnp.zeros((n_tiles, px), jnp.float32),
        jnp.zeros((n_tiles, px), jnp.float32),
        jnp.zeros((n_tiles, px), bool),
    )
    (T, C, Dd, S, Med, _), _ = jax.lax.scan(
        jax.checkpoint(chunk_step), init, xs
    )

    def untile(a):
        ch = a.shape[2:]
        a = a.reshape((ty, tx, tsy, tsx) + ch)
        a = jnp.swapaxes(a, 1, 2).reshape((ty * tsy, tx * tsx) + ch)
        return a[: cam.height, : cam.width]

    bg = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (3,))
    return RenderOutput(
        color=untile(C) + untile(T)[..., None] * bg,
        depth=untile(Dd),
        alpha=untile(S),
        median_depth=jax.lax.stop_gradient(untile(Med)),
        final_t=untile(T),
        radii=prep.radius,
    )


def render_binned(
    prep: Preprocessed,
    bins: TileBins,
    cam: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray | float = 0.0,
) -> RenderOutput:
    """Backend dispatcher: the Pallas kernels on TPU (VMEM-resident blend,
    per-tile dynamic trip counts, early exit), the XLA blend elsewhere.
    Both satisfy the same contract and are cross-validated in tests."""
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from gsorb_slam_tpu.raster.pallas_raster import render_pallas

        return render_pallas(prep, bins, cam, cfg, bg)
    return render_tiled(prep, bins, cam, cfg, bg)


def render(
    means: jnp.ndarray,
    rgb: jnp.ndarray,
    quats: jnp.ndarray,
    logit_opacities: jnp.ndarray,
    log_scales: jnp.ndarray,
    active: jnp.ndarray,
    T_cw: jnp.ndarray,
    cam: Camera,
    cfg: RasterConfig = RasterConfig(),
    bg: jnp.ndarray | float = 0.0,
    scale_modifier: float = 1.0,
    bins: TileBins | None = None,
) -> RenderOutput:
    """Convenience one-shot render: preprocess -> (bin) -> blend.

    Pass cached ``bins`` to skip the sort (the per-view amortization); fresh
    bins are built from a stop-gradient view of the preprocess (binning is
    integer-valued — no gradient flows through it, as in CUDA).
    """
    prep = preprocess(
        means, rgb, quats, logit_opacities, log_scales, active, T_cw, cam, scale_modifier
    )
    if bins is None:
        bins = bin_gaussians(jax.lax.stop_gradient(prep), cam, cfg)
    return render_binned(prep, bins, cam, cfg, bg)
