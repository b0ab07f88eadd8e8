"""Pallas TPU kernels for the tile alpha-blend (forward + custom VJP).

This is the production replacement for the XLA blend in ``tiled.py`` — the
TPU equivalent of ``renderCUDA`` forward (``forward.cu:261-401``) and
backward (``backward.cu:399-556``). Same contract as :func:`tiled.render_tiled`
given the same :class:`TileBins`; validated against it (and transitively
against the dense oracle) in tests.

Why a kernel at all: the XLA version materializes every [tiles, px, K]
intermediate in HBM (~GBs per render). Here each tile is one grid program
whose accumulators live in VMEM, chunk trip counts follow the tile's REAL
instance count (scalar-prefetched), and the chunk loop exits early once
every pixel saturates (the dominant effect in opaque scenes — CUDA's
block-level ``__syncthreads_count(done)`` break).

Layout: chunk arrays are [K=chunk on sublanes, px=tile^2 on lanes]; the
sequential transmittance recurrence is a masked-roll cumulative product
along sublanes (log2 K shift-multiply passes — no log/exp chain), and the
within-chunk suffix sums of the backward use the same rolls reversed.

Gradient semantics match the CUDA binding: color/depth/alpha/final-T flow;
median depth does not (``include/Rasterizer.cuh:209-212``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster.binning import TileBins, tile_grid_shape
from gsorb_slam_tpu.raster.preprocess import Preprocessed
from gsorb_slam_tpu.raster.types import RasterConfig, RenderOutput

MIN_ALPHA = 1.0 / 255.0
STOP_T = 1e-4

# packed attribute rows
_MU, _MV, _CA, _CB, _CC, _OP, _R, _G, _B, _Z, _LIVE = range(11)
N_ATTR = 12  # padded to a friendly sublane count

# instance-gradient rows
_N_GRAD = 10  # d_mu, d_mv, d_ca, d_cb, d_cc, d_op, d_r, d_g, d_b, d_z


def _masked_roll_mul(x: jnp.ndarray, K: int) -> jnp.ndarray:
    """Inclusive cumulative product along axis 0 (sublanes) via shifts."""
    s = 1
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    while s < K:
        shifted = pltpu.roll(x, s, axis=0)
        x = x * jnp.where(iota >= s, shifted, 1.0)
        s *= 2
    return x


def _excl_cumprod(x: jnp.ndarray, K: int) -> jnp.ndarray:
    """Exclusive cumulative product along sublanes (row 0 -> 1)."""
    inc = _masked_roll_mul(x, K)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(iota >= 1, pltpu.roll(inc, 1, axis=0), 1.0)


def _incl_cummax(x: jnp.ndarray, K: int) -> jnp.ndarray:
    """Inclusive cumulative max along sublanes."""
    s = 1
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    neg = jnp.full_like(x, -jnp.inf)
    while s < K:
        shifted = pltpu.roll(x, s, axis=0)
        x = jnp.maximum(x, jnp.where(iota >= s, shifted, neg))
        s *= 2
    return x


def _excl_rev_cumsum(x: jnp.ndarray, K: int) -> jnp.ndarray:
    """Exclusive REVERSED cumulative sum along sublanes:
    out[k] = sum_{j>k} x[j]. (Non-negative roll amounts only.)"""
    s = 1
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    acc = x
    while s < K:
        shifted = pltpu.roll(acc, K - s, axis=0)  # == shift up by s (wrapped)
        acc = acc + jnp.where(iota < K - s, shifted, 0.0)
        s *= 2
    out = pltpu.roll(acc, K - 1, axis=0)
    return jnp.where(iota < K - 1, out, 0.0)


class _Dims(NamedTuple):
    ts: int  # tile side
    px: int  # ts*ts
    cap: int
    K: int
    n_chunks: int
    tx: int  # tiles per row
    n_tiles: int
    exact: bool  # CUDA-exact early-stop semantics (see RasterConfig)


def _chunk_alpha(chunk, pu, pv, T_in, done, exact=True):
    """Shared fwd/bwd per-chunk math.

    chunk: [N_ATTR, K] attribute slab; pu/pv: [1, px] pixel coords;
    T_in: [1, px] incoming transmittance; done: [1, px] bool.
    ``exact``: CUDA-exact early stop (cumulative-max of crossing flags) vs
    fast mode (apply while incoming T >= threshold; <=1e-4 deviation).
    Returns (alpha, clamped gate, apply mask, T_pref, w, T_out, done_out, power).
    """
    K = chunk.shape[1]
    col = lambda r: chunk[r, :][:, None]  # [K, 1]
    d0 = col(_MU) - pu  # [K, px]
    d1 = col(_MV) - pv
    power = (
        -0.5 * (col(_CA) * d0 * d0 + col(_CC) * d1 * d1) - col(_CB) * d0 * d1
    )
    raw = col(_OP) * jnp.exp(power)
    unclamped = raw < 0.99
    alpha = jnp.minimum(0.99, raw)
    contrib = (
        (col(_LIVE) > 0.5)
        & (power <= 0.0)
        & (alpha >= MIN_ALPHA)
        & jnp.logical_not(done)
    )
    alpha = jnp.where(contrib, alpha, 0.0)
    one_minus = 1.0 - alpha
    T_pref = T_in * _excl_cumprod(one_minus, K)  # [K, px]
    if exact:
        crosses = contrib & (T_pref * one_minus < STOP_T)
        blocked = _incl_cummax(crosses.astype(jnp.float32), K) > 0.5
        apply = contrib & jnp.logical_not(blocked)
        done_extra = jnp.any(crosses, axis=0, keepdims=True)
    else:
        apply = contrib & (T_pref >= STOP_T)
        done_extra = None
    w = jnp.where(apply, alpha * T_pref, 0.0)
    # prod over applied instances = last row of an inclusive roll-cumprod
    # (Mosaic has no reduce_prod lowering).
    incl = _masked_roll_mul(jnp.where(apply, one_minus, 1.0), K)
    T_out = T_in * incl[K - 1 :, :]
    if exact:
        done_out = done | done_extra
    else:
        done_out = done | (T_out < STOP_T)
    return alpha, unclamped, apply, T_pref, w, T_out, done_out, power


def _fwd_kernel(counts_ref, packed_ref, out_ref, chunk_t_ref, acc_ref, *, dims: _Dims):
    # acc_ref VMEM scratch rows: 0=T 1=Cr 2=Cg 3=Cb 4=D 5=S 6=Med 7=done.
    # Loop-carried pixel vectors live in scratch (Mosaic cannot reconcile
    # replicated-constant vs computed layouts across while-loop yields).
    t = pl.program_id(0)
    count = counts_ref[t]
    ts, px, K = dims.ts, dims.px, dims.K

    pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    ox = (t % dims.tx) * ts
    oy = (t // dims.tx) * ts
    pu = (ox + pix_i % ts).astype(jnp.float32)  # [1, px]
    pv = (oy + pix_i // ts).astype(jnp.float32)

    acc_ref[...] = jnp.zeros((8, px), jnp.float32)
    acc_ref[0, :] = jnp.ones((px,), jnp.float32)

    n_chunks_live = jnp.minimum(
        (count + K - 1) // K, dims.n_chunks
    ).astype(jnp.int32)

    def cond(c):
        return (c < n_chunks_live) & (jnp.sum(acc_ref[7, :]) < px - 0.5)

    def body(c):
        T = acc_ref[0:1, :]
        done = acc_ref[7:8, :] > 0.5
        chunk_t_ref[0, c, :] = jnp.where(done, 0.0, T)[0]
        chunk = packed_ref[0, :, pl.ds(c * K, K)]  # [N_ATTR, K]
        alpha, _unc, apply, T_pref, w, T_out, done_out, _pw = _chunk_alpha(
            chunk, pu, pv, T, done, dims.exact
        )
        col = lambda r: chunk[r, :][:, None]
        acc = lambda attr_row: jnp.sum(w * attr_row, axis=0, keepdims=True)
        acc_ref[1:2, :] = acc_ref[1:2, :] + acc(col(_R))
        acc_ref[2:3, :] = acc_ref[2:3, :] + acc(col(_G))
        acc_ref[3:4, :] = acc_ref[3:4, :] + acc(col(_B))
        acc_ref[4:5, :] = acc_ref[4:5, :] + acc(col(_Z))
        acc_ref[5:6, :] = acc_ref[5:6, :] + jnp.sum(w, axis=0, keepdims=True)
        # Median: z of LAST applied instance with T_pref > 0.5.
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, px), 0)
        is_med = apply & (T_pref > 0.5)
        last = jnp.max(jnp.where(is_med, k_iota + 1, 0), axis=0, keepdims=True)
        onehot = (k_iota + 1) == last
        z_sel = jnp.sum(jnp.where(onehot, col(_Z), 0.0), axis=0, keepdims=True)
        acc_ref[6:7, :] = jnp.where(last > 0, z_sel, acc_ref[6:7, :])
        acc_ref[0:1, :] = T_out
        acc_ref[7:8, :] = done_out.astype(jnp.float32)
        return c + 1

    c_end = jax.lax.while_loop(cond, body, jnp.zeros((), jnp.int32))

    # Chunks never entered (early exit / short tiles) get T_in = 0 so the
    # backward recompute yields zero gradients for them.
    T = acc_ref[0:1, :]
    done = acc_ref[7:8, :] > 0.5
    masked_T = jnp.where(done, 0.0, T)[0]

    def zero_body(c, _):
        chunk_t_ref[0, c, :] = masked_T
        return 0

    jax.lax.fori_loop(c_end, dims.n_chunks, zero_body, 0)

    out_ref[0, 0, :] = acc_ref[1, :]
    out_ref[0, 1, :] = acc_ref[2, :]
    out_ref[0, 2, :] = acc_ref[3, :]
    out_ref[0, 3, :] = acc_ref[4, :]
    out_ref[0, 4, :] = acc_ref[5, :]
    out_ref[0, 5, :] = acc_ref[6, :]
    out_ref[0, 6, :] = acc_ref[0, :]
    out_ref[0, 7, :] = jnp.zeros((dims.px,), jnp.float32)
    chunk_t_ref[0, dims.n_chunks, :] = acc_ref[0, :]


def _bwd_kernel(
    counts_ref, packed_ref, chunk_t_ref, gout_ref, grad_ref, r_ref, *, dims: _Dims
):
    t = pl.program_id(0)
    count = counts_ref[t]
    ts, px, K = dims.ts, dims.px, dims.K

    pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    ox = (t % dims.tx) * ts
    oy = (t // dims.tx) * ts
    pu = (ox + pix_i % ts).astype(jnp.float32)
    pv = (oy + pix_i // ts).astype(jnp.float32)

    gCr = gout_ref[0, 0, :][None, :]
    gCg = gout_ref[0, 1, :][None, :]
    gCb = gout_ref[0, 2, :][None, :]
    gD = gout_ref[0, 3, :][None, :]
    gS = gout_ref[0, 4, :][None, :]
    gT = gout_ref[0, 6, :][None, :]

    grad_ref[...] = jnp.zeros(grad_ref.shape, grad_ref.dtype)

    T_final = chunk_t_ref[0, dims.n_chunks, :][None, :]
    n_chunks_live = jnp.minimum((count + K - 1) // K, dims.n_chunks).astype(jnp.int32)

    r_ref[...] = T_final * gT  # suffix accumulator lives in scratch

    def body(i, _):
        R = r_ref[0:1, :]
        c = n_chunks_live - 1 - i
        T_in = chunk_t_ref[0, c, :][None, :]
        done = T_in <= 0.0
        chunk = packed_ref[0, :, pl.ds(c * K, K)]
        alpha, unclamped, apply, T_pref, w, _T_out, _done_out, power = _chunk_alpha(
            chunk, pu, pv, T_in, done, dims.exact
        )
        col = lambda r: chunk[r, :][:, None]
        phi = gCr * col(_R) + gCg * col(_G) + gCb * col(_B) + gD * col(_Z) + gS
        wphi = w * phi  # [K, px]
        suffix = _excl_rev_cumsum(wphi, K) + R  # [K, px]
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = jnp.where(
            apply, T_pref * phi - suffix / one_minus, 0.0
        )
        # alpha = min(0.99, op * exp(power)); grad gated off when clamped.
        gate = jnp.where(apply & unclamped, d_alpha, 0.0)
        d_power = gate * alpha  # [K, px]
        d0 = col(_MU) - pu
        d1 = col(_MV) - pv
        red = lambda x: jnp.sum(x, axis=1, keepdims=True)  # [K, 1]
        op_safe = jnp.maximum(col(_OP), 1e-12)
        G = jnp.concatenate(
            [
                red(d_power * (-(col(_CA) * d0 + col(_CB) * d1))),
                red(d_power * (-(col(_CC) * d1 + col(_CB) * d0))),
                red(d_power * (-0.5 * d0 * d0)),
                red(d_power * (-(d0 * d1))),
                red(d_power * (-0.5 * d1 * d1)),
                red(gate * alpha / op_safe),
                red(w * gCr),
                red(w * gCg),
                red(w * gCb),
                red(w * gD),
            ],
            axis=1,
        )  # [K, N_GRAD]
        grad_ref[0, :, pl.ds(c * K, K)] = G.T
        r_ref[...] = R + jnp.sum(wphi, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_chunks_live, body, 0)


def _pack_instances(prep: Preprocessed, bins: TileBins) -> jnp.ndarray:
    """Gather per-tile instance attributes into [T, N_ATTR, cap] (XLA).

    ONE row gather of a pre-packed [C, N_ATTR] matrix (48B contiguous per
    instance) — 12 separate element gathers cost ~115ms at VGA scale vs
    ~10ms for the row gather.
    """
    T, cap = bins.indices.shape
    cols = jnp.stack(
        [
            prep.mean2d[:, 0],
            prep.mean2d[:, 1],
            prep.conic[:, 0],
            prep.conic[:, 1],
            prep.conic[:, 2],
            prep.opacity,
            prep.color[:, 0],
            prep.color[:, 1],
            prep.color[:, 2],
            jnp.where(prep.valid, prep.depth, 0.0),
            prep.valid.astype(jnp.float32),
            jnp.zeros_like(prep.opacity),
        ],
        axis=1,
    )  # [C, N_ATTR]
    idx = jnp.maximum(bins.indices, 0)
    rows = cols[idx.reshape(-1)].reshape(T, cap, N_ATTR)
    # Fold the per-tile count into the live column (elementwise, no gather).
    k = jnp.arange(cap, dtype=jnp.int32)
    live = (k[None, :] < bins.counts[:, None]).astype(jnp.float32)
    rows = rows.at[:, :, _LIVE].multiply(live)
    rows = rows.at[:, :, _Z].multiply(live)
    return jnp.swapaxes(rows, 1, 2)  # [T, N_ATTR, cap]


def _dims_for(cam: Camera, cfg: RasterConfig, cap: int) -> _Dims:
    ty, tx = tile_grid_shape(cam, cfg)
    K = min(cfg.chunk, cap)
    assert cap % K == 0 and (K & (K - 1)) == 0, "chunk must be power of two"
    return _Dims(
        ts=cfg.tile,
        px=cfg.tile * cfg.tile,
        cap=cap,
        K=K,
        n_chunks=cap // K,
        tx=tx,
        n_tiles=ty * tx,
        exact=cfg.exact_stop,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _blend(packed, counts, dims: _Dims, interpret: bool):
    out, _ = _blend_fwd_impl(packed, counts, dims, interpret)
    return out


def _blend_fwd_impl(packed, counts, dims: _Dims, interpret: bool):
    T = dims.n_tiles
    out, chunk_t = pl.pallas_call(
        functools.partial(_fwd_kernel, dims=dims),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(
                    (1, N_ATTR, dims.cap), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 8, dims.px), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, dims.n_chunks + 1, dims.px), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[pltpu.VMEM((8, dims.px), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, dims.px), jnp.float32),
            jax.ShapeDtypeStruct((T, dims.n_chunks + 1, dims.px), jnp.float32),
        ],
        interpret=interpret,
    )(counts, packed)
    return out, chunk_t


def _blend_vjp_fwd(packed, counts, dims: _Dims, interpret: bool):
    out, chunk_t = _blend_fwd_impl(packed, counts, dims, interpret)
    return out, (packed, counts, chunk_t)


def _blend_vjp_bwd(dims: _Dims, interpret: bool, res, g_out):
    packed, counts, chunk_t = res
    T = dims.n_tiles
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, dims=dims),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(
                    (1, N_ATTR, dims.cap), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, dims.n_chunks + 1, dims.px), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 8, dims.px), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, _N_GRAD, dims.cap), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((1, dims.px), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, _N_GRAD, dims.cap), jnp.float32),
        interpret=interpret,
    )(counts, packed, chunk_t, g_out)
    # d packed: scatter rows back into the packed layout (N_ATTR rows).
    z = jnp.zeros_like(packed[:, 0, :])
    d_packed = jnp.stack(
        [
            grads[:, 0], grads[:, 1], grads[:, 2], grads[:, 3], grads[:, 4],
            grads[:, 5], grads[:, 6], grads[:, 7], grads[:, 8], grads[:, 9],
            z, z,
        ],
        axis=1,
    )
    return d_packed, None


_blend.defvjp(_blend_vjp_fwd, _blend_vjp_bwd)


def blend_and_untile(
    packed: jnp.ndarray,  # [T, N_ATTR, cap] screen-space instance rows
    counts: jnp.ndarray,
    cam: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray | float = 0.0,
    interpret: bool | None = None,
    radii: jnp.ndarray | None = None,
) -> RenderOutput:
    """Run the Pallas blend pair on a packed screen-instance array and
    reassemble image-space outputs."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cap = packed.shape[2]
    dims = _dims_for(cam, cfg, cap)
    ty, tx = tile_grid_shape(cam, cfg)

    out = _blend(packed, counts, dims, interpret)

    def untile(a):  # [T, px] -> [H, W]
        a = a.reshape(ty, tx, dims.ts, dims.ts)
        a = jnp.swapaxes(a, 1, 2).reshape(ty * dims.ts, tx * dims.ts)
        return a[: cam.height, : cam.width]

    Cr = untile(out[:, 0])
    Cg = untile(out[:, 1])
    Cb = untile(out[:, 2])
    D = untile(out[:, 3])
    S = untile(out[:, 4])
    Med = untile(out[:, 5])
    Tf = untile(out[:, 6])
    bg = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (3,))
    color = jnp.stack([Cr, Cg, Cb], axis=-1) + Tf[..., None] * bg
    return RenderOutput(
        color=color,
        depth=D,
        alpha=S,
        median_depth=jax.lax.stop_gradient(Med),
        final_t=Tf,
        radii=radii if radii is not None else jnp.zeros((packed.shape[0],)),
    )


def render_pallas(
    prep: Preprocessed,
    bins: TileBins,
    cam: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray | float = 0.0,
    interpret: bool | None = None,
) -> RenderOutput:
    """Drop-in replacement for :func:`tiled.render_tiled` using the Pallas
    kernels. ``interpret`` defaults to True off-TPU so tests run anywhere.

    The per-Gaussian gather here is differentiable; its backward is the
    scatter-add into per-Gaussian gradients (BACKWARD::render's atomics).
    For pose-only optimization use :mod:`raster.instances`, which amortizes
    the gather across all iterations of a frame.
    """
    packed = _pack_instances(prep, bins)
    return blend_and_untile(
        packed, bins.counts, cam, cfg, bg, interpret, radii=prep.radius
    )
