"""Pallas TPU kernels for the tile alpha-blend (forward + custom VJP).

This is the production replacement for the XLA blend in ``tiled.py`` — the
TPU equivalent of ``renderCUDA`` forward (``forward.cu:261-401``) and
backward (``backward.cu:399-556``). Same contract as :func:`tiled.render_tiled`
given the same :class:`TileBins`; validated against it (and transitively
against the dense oracle) in tests.

Kernel design (round-2 MXU rewrite). The CUDA kernel is one-pixel-per-thread
scalar code; a TPU tile program works on a [K instances, px pixels] slab, and
the round-1 kernel expressed everything as VPU elementwise passes (~80 per
chunk, plus per-attribute lane->sublane relayouts) — measured 8 ms forward /
12 ms backward at VGA/874k instances. The dominant ops are all contractions,
so they now run on the MXU instead:

- the Gaussian falloff ``power`` is quadratic in pixel coordinates, so a
  per-chunk coefficient bundle [K, 8] against a per-tile polynomial pixel
  basis [8, px] gives power = G @ P in ONE matmul;
- the front-to-back transmittance recurrence is a cumulative sum of
  log(1-alpha) along the instance axis = a strictly-lower-triangular
  [K, K] matmul (optionally bf16 with f32 accumulation);
- the five output accumulators (r, g, b, depth, opacity) are A[5,K] @ w[K,px];
- every backward reduction over pixels is a matmul against the SAME pixel
  basis: sum_px d_power * {1, pu, pv, pu^2, pu*pv, pv^2} = d_power @ P^T,
  from which d{mean2d, conic} follow by per-instance algebra, and
  sum_px w * dL/d{color,depth} = w @ G5^T.

Pixel coordinates are tile-local so the f32 quadratic basis keeps precision.
Chunk trip counts follow the tile's REAL instance count (scalar-prefetched)
and the chunk loop exits early once every pixel saturates (CUDA's
``__syncthreads_count(done)`` break); the backward skips chunks whose stored
incoming transmittance is all-zero instead of reprocessing the full capacity.

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

# packed attribute rows. The opacity row is pre-multiplied by the live mask
# (dead instances blend with alpha exactly 0), so the kernels never touch
# the _LIVE row — it is kept for the XLA fallback path.
_MU, _MV, _CA, _CB, _CC, _OP, _R, _G, _B, _Z, _LIVE = range(11)
N_ATTR = 12  # padded to a friendly sublane count

# instance-gradient columns
_N_GRAD = 10  # d_mu, d_mv, d_ca, d_cb, d_cc, d_op, d_r, d_g, d_b, d_z


class _Dims(NamedTuple):
    ts: int  # tile side
    px: int  # ts*ts
    cap: int
    K: int
    n_chunks: int
    tx: int  # tiles per row
    n_tiles: int
    exact: bool  # CUDA-exact early-stop semantics (see RasterConfig)
    bf16: bool  # bf16 MXU inputs for the triangular cumsum matmuls
    unroll: int  # chunk steps per while-loop iteration (fixed ~340ns/iter
    #   loop overhead dominates the chunk math, so early exit is checked at
    #   super-chunk granularity and the inner steps are Python-unrolled)


def _pixel_basis(dims: _Dims, t) -> jnp.ndarray:
    """[8, px] tile-LOCAL polynomial basis: 1, pu, pv, pu^2, pu*pv, pv^2, 0, 0."""
    px, ts = dims.px, dims.ts
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    pu = (pix % ts).astype(jnp.float32)
    pv = (pix // ts).astype(jnp.float32)
    one = jnp.ones((1, px), jnp.float32)
    zero = jnp.zeros((1, px), jnp.float32)
    return jnp.concatenate([one, pu, pv, pu * pu, pu * pv, pv * pv, zero, zero], 0)


def _tri(K: int, strict_lower: bool, dtype) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return ((r > c) if strict_lower else (r < c)).astype(dtype)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """Contraction over the LAST dim of both: [m, k] x [n, k] -> [m, n]."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _chunk_common(chunk, tri_l, pbas, T_in, done, ox, oy, dims: _Dims):
    """Shared fwd/bwd per-chunk math on the [K, px] slab.

    chunk: [N_ATTR, K] attribute rows (tile-global mean coords);
    tri_l: [K, K] strictly-lower triangular (cumsum operator);
    pbas: [8, px] tile-local pixel basis; T_in: [1, px]; done: [1, px] bool;
    ox/oy: tile origin in pixels (hoisted program_id — interpret mode cannot
    bind program_id inside while_loop bodies).
    Returns (bundle [K,8] cols g0..g5|op|z, alpha, unclamped, apply, T_pref,
    w, T_out, done_out).
    """
    row = lambda r: chunk[r : r + 1, :]  # [1, K]
    mu = row(_MU) - ox  # tile-local
    mv = row(_MV) - oy
    ca, cb, cc = row(_CA), row(_CB), row(_CC)
    op, z = row(_OP), row(_Z)
    ln_op = jnp.log(jnp.maximum(op, 1e-12))
    # power(pu,pv) = g0 + g1*pu + g2*pv + g3*pu^2 + g4*pu*pv + g5*pv^2, with
    # ln(op) folded into g0 so the matmul yields ln(alpha_raw) directly —
    # no per-instance [K,1] column broadcast (column-layout ops cost ~3x the
    # row math on TPU; everything here stays in [1,K] row space).
    g0 = -0.5 * (ca * mu * mu + cc * mv * mv) - cb * mu * mv + ln_op
    g1 = ca * mu + cb * mv
    g2 = cc * mv + cb * mu
    g3 = -0.5 * ca
    g4 = -cb
    g5 = -0.5 * cc
    grows = jnp.concatenate(
        [g0, g1, g2, g3, g4, g5, jnp.zeros((2, chunk.shape[1]), jnp.float32)], 0
    )  # [8, K]
    ln_alpha = jax.lax.dot_general(
        grows, pbas, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, px]
    # The only per-instance columns the [K, px] math needs: ln(op) and z.
    bundle = jnp.concatenate([ln_op, z], 0).T  # [K, 2]
    lnop_c = bundle[:, 0:1]
    raw = jnp.exp(ln_alpha)
    unclamped = raw < 0.99
    alpha = jnp.minimum(raw, 0.99)
    # power <= 0  <=>  ln_alpha <= ln(op) (dead: op == 0 -> alpha < MIN).
    contrib = (ln_alpha <= lnop_c) & (alpha >= MIN_ALPHA) & jnp.logical_not(done)
    alpha = jnp.where(contrib, alpha, 0.0)
    s = jnp.log1p(-alpha)  # 0 for non-contributors
    if dims.bf16:
        cum_excl = _mm(tri_l, s.astype(jnp.bfloat16))
    else:
        cum_excl = _mm(tri_l, s)
    T_pref = T_in * jnp.exp(cum_excl)  # [K, px]
    one_minus = 1.0 - alpha
    if dims.exact:
        crosses = contrib & (T_pref * one_minus < STOP_T)
        cf = crosses.astype(tri_l.dtype)
        blocked = (_mm(tri_l, cf) + cf) > 0.5  # inclusive cumulative any
        apply = contrib & jnp.logical_not(blocked)
        done_extra = jnp.any(crosses, axis=0, keepdims=True)
    else:
        apply = contrib & (T_pref >= STOP_T)
        done_extra = None
    w = jnp.where(apply, alpha * T_pref, 0.0)
    s_applied = jnp.where(apply, s, 0.0)
    T_out = T_in * jnp.exp(jnp.sum(s_applied, axis=0, keepdims=True))
    if dims.exact:
        done_out = done | done_extra
    else:
        done_out = done | (T_out < STOP_T)
    return bundle, alpha, unclamped, apply, T_pref, w, T_out, done_out


def _fwd_kernel(
    counts_ref, packed_ref, out_ref, chunk_t_ref, acc_ref, pbas_ref, tri_ref,
    *, dims: _Dims
):
    # acc_ref rows: 0..2=Cr,Cg,Cb 3=D 4=S 5=Med 6=T 7=done.
    t = pl.program_id(0)
    count = counts_ref[t]
    px, K, U = dims.px, dims.K, dims.unroll
    ox = ((t % dims.tx) * dims.ts).astype(jnp.float32)
    oy = ((t // dims.tx) * dims.ts).astype(jnp.float32)

    pbas_ref[...] = _pixel_basis(dims, t)
    tri_ref[...] = _tri(K, True, tri_ref.dtype)

    acc_ref[...] = jnp.zeros((8, px), jnp.float32)
    acc_ref[6, :] = jnp.ones((px,), jnp.float32)

    n_chunks_live = jnp.minimum((count + K - 1) // K, dims.n_chunks).astype(jnp.int32)
    n_super = (n_chunks_live + U - 1) // U

    def cond(sc):
        return (sc < n_super) & (jnp.sum(acc_ref[7, :]) < px - 0.5)

    def body(sc):
        acc = acc_ref[0:6, :]  # Cr,Cg,Cb,D,S,Med held locally over the unroll
        T = acc_ref[6:7, :]
        done = acc_ref[7:8, :] > 0.5
        for j in range(U):
            c = sc * U + j
            chunk_t_ref[0, pl.ds(c, 1), :] = jnp.where(done, 0.0, T)
            chunk = packed_ref[0, :, pl.ds(c * K, K)]  # [N_ATTR, K]
            bundle, alpha, _unc, apply, T_pref, w, T_out, done_out = _chunk_common(
                chunk, tri_ref[...], pbas_ref[...], T, done, ox, oy, dims
            )
            row = lambda r: chunk[r : r + 1, :]
            ones = jnp.ones((1, K), jnp.float32)
            A6 = jnp.concatenate(
                [row(_R), row(_G), row(_B), row(_Z), ones, jnp.zeros((1, K), jnp.float32)], 0
            )
            accum = _mm(A6, w)  # rows 0..4 = Cr,Cg,Cb,D,S; row 5 = 0
            # Median: z of LAST applied instance with T_pref > 0.5, selected
            # by a one-hot matmul against the z row (no [K,1] column math).
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, px), 0)
            is_med = apply & (T_pref > 0.5)
            last = jnp.max(jnp.where(is_med, k_iota + 1, 0), axis=0, keepdims=True)
            onehot = ((k_iota + 1) == last).astype(jnp.float32)
            z_sel = jax.lax.dot_general(
                row(_Z), onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, px]
            acc = acc + accum
            acc = jnp.concatenate(
                [acc[0:5, :], jnp.where(last > 0, z_sel, acc[5:6, :])], 0
            )
            T, done = T_out, done_out
        acc_ref[0:6, :] = acc
        acc_ref[6:7, :] = T
        acc_ref[7:8, :] = done.astype(jnp.float32)
        return sc + 1

    sc_end = jax.lax.while_loop(cond, body, jnp.zeros((), jnp.int32))

    # Chunks never entered (early exit / short tiles) get T_in = 0 so the
    # backward recompute yields zero gradients for them.
    T = acc_ref[6:7, :]
    done = acc_ref[7:8, :] > 0.5
    masked_T = jnp.where(done, 0.0, T)

    def zero_body(c, _):
        chunk_t_ref[0, pl.ds(c, 1), :] = masked_T
        return 0

    jax.lax.fori_loop(sc_end * U, dims.n_chunks, zero_body, 0)

    out_ref[0, 0:6, :] = acc_ref[0:6, :]
    out_ref[0, 6:7, :] = T
    out_ref[0, 7:8, :] = jnp.zeros((1, px), jnp.float32)
    chunk_t_ref[0, dims.n_chunks, :] = acc_ref[6, :]


def _bwd_kernel(
    counts_ref, packed_ref, chunk_t_ref, gout_ref, grad_ref,
    r_ref, pbas_ref, tri_ref, utri_ref, *, dims: _Dims
):
    t = pl.program_id(0)
    count = counts_ref[t]
    px, K = dims.px, dims.K
    ox = ((t % dims.tx) * dims.ts).astype(jnp.float32)
    oy = ((t // dims.tx) * dims.ts).astype(jnp.float32)

    pbas_ref[...] = _pixel_basis(dims, t)
    tri_ref[...] = _tri(K, True, tri_ref.dtype)
    utri_ref[...] = _tri(K, False, utri_ref.dtype)

    # G5 [5, px]: dL/d{Cr, Cg, Cb, D, S} pixel rows (static slices, no relayout).
    G5 = gout_ref[0, 0:5, :]
    gT = gout_ref[0, 6:7, :]

    grad_ref[...] = jnp.zeros(grad_ref.shape, grad_ref.dtype)

    T_final = chunk_t_ref[0, dims.n_chunks, :][None, :]
    n_chunks_live = jnp.minimum((count + K - 1) // K, dims.n_chunks).astype(jnp.int32)
    U = dims.unroll
    n_super = (n_chunks_live + U - 1) // U

    r_ref[...] = T_final * gT  # suffix accumulator lives in scratch

    def chunk_grad(c, R):
        T_in = chunk_t_ref[0, pl.ds(c, 1), :]  # [1, px]
        done = T_in <= 0.0
        chunk = packed_ref[0, :, pl.ds(c * K, K)]
        bundle, alpha, unclamped, apply, T_pref, w, _T_out, _d = _chunk_common(
            chunk, tri_ref[...], pbas_ref[...], T_in, done, ox, oy, dims
        )
        row = lambda r: chunk[r : r + 1, :]
        ones = jnp.ones((1, K), jnp.float32)
        A5 = jnp.concatenate([row(_R), row(_G), row(_B), row(_Z), ones], 0)
        # phi[k, p] = gCr*r_k + gCg*g_k + gCb*b_k + gD*z_k + gS
        phi = jax.lax.dot_general(
            A5, G5, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, px]
        wphi = w * phi
        if dims.bf16:
            suffix = _mm(utri_ref[...], wphi.astype(jnp.bfloat16)) + R
        else:
            suffix = _mm(utri_ref[...], wphi) + R
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = jnp.where(apply, T_pref * phi - suffix / one_minus, 0.0)
        # alpha = min(0.99, op * exp(power)); grad gated off when clamped.
        d_power = jnp.where(apply & unclamped, d_alpha, 0.0) * alpha
        # All pixel reductions through the polynomial basis, emitted in
        # [1, K] ROW space (column-layout algebra costs ~2x the whole bwd):
        # Srows[b] = sum_px d_power * basis_b  (rows 6,7 of pbas are zero).
        Srows = jax.lax.dot_general(
            pbas_ref[...], d_power, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, K]
        WGrows = jax.lax.dot_general(
            G5, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [5, K]: sum_px w * dL/d{Cr,Cg,Cb,D,(S)}
        S0 = Srows[0:1, :]
        S1u = Srows[1:2, :]
        S1v = Srows[2:3, :]
        S2uu = Srows[3:4, :]
        S2uv = Srows[4:5, :]
        S2vv = Srows[5:6, :]
        mu = row(_MU) - ox
        mv = row(_MV) - oy
        ca, cb, cc, op = row(_CA), row(_CB), row(_CC), row(_OP)
        # d0 = mu - pu, d1 = mv - pv (tile-local, matching the basis):
        E0 = mu * S0 - S1u  # sum d_power * d0
        E1 = mv * S0 - S1v  # sum d_power * d1
        d_mu = -(ca * E0 + cb * E1)
        d_mv = -(cc * E1 + cb * E0)
        d_ca = -0.5 * (mu * mu * S0 - 2.0 * mu * S1u + S2uu)
        d_cb = -(mu * mv * S0 - mu * S1v - mv * S1u + S2uv)
        d_cc = -0.5 * (mv * mv * S0 - 2.0 * mv * S1v + S2vv)
        d_op = S0 / jnp.maximum(op, 1e-12)
        G16 = jnp.concatenate(
            [d_mu, d_mv, d_ca, d_cb, d_cc, d_op, WGrows[0:4, :],
             jnp.zeros((16 - _N_GRAD, K), jnp.float32)],
            axis=0,
        )  # [16, K] — already in the packed row layout, contiguous store.
        grad_ref[0, :, pl.ds(c * K, K)] = G16
        return R + jnp.sum(wphi, axis=0, keepdims=True)

    def body(i, _):
        sc = n_super - 1 - i
        # Skip whole super-chunks the forward never entered (early exit):
        # their stored incoming transmittance is all-zero.
        first_T = chunk_t_ref[0, pl.ds(sc * U, 1), :]
        entered = jnp.max(first_T) > 0.0

        @pl.when(entered)
        def _():
            R = r_ref[0:1, :]
            for j in range(U - 1, -1, -1):
                R = chunk_grad(sc * U + j, R)
            r_ref[...] = R

        return 0

    jax.lax.fori_loop(0, n_super, body, 0)


def _pack_instances(prep: Preprocessed, bins: TileBins) -> jnp.ndarray:
    """Gather per-tile instance attributes into [T, N_ATTR, cap] (XLA).

    ONE row gather of a pre-packed [C, N_ATTR] matrix (48B contiguous per
    instance) — 12 separate element gathers cost ~115ms at VGA scale vs
    ~10ms for the row gather.
    """
    T, cap = bins.indices.shape
    vf = prep.valid.astype(jnp.float32)
    cols = jnp.stack(
        [
            prep.mean2d[:, 0],
            prep.mean2d[:, 1],
            prep.conic[:, 0],
            prep.conic[:, 1],
            prep.conic[:, 2],
            prep.opacity * vf,
            prep.color[:, 0],
            prep.color[:, 1],
            prep.color[:, 2],
            jnp.where(prep.valid, prep.depth, 0.0),
            vf,
            jnp.zeros_like(prep.opacity),
        ],
        axis=1,
    )  # [C, N_ATTR]
    idx = jnp.maximum(bins.indices, 0)
    rows = cols[idx.reshape(-1)].reshape(T, cap, N_ATTR)
    # Fold the per-tile count into the live AND opacity columns
    # (elementwise, no gather) — the kernels gate purely on opacity.
    k = jnp.arange(cap, dtype=jnp.int32)
    live = (k[None, :] < bins.counts[:, None]).astype(jnp.float32)
    rows = rows.at[:, :, _LIVE].multiply(live)
    rows = rows.at[:, :, _OP].multiply(live)
    rows = rows.at[:, :, _Z].multiply(live)
    return jnp.swapaxes(rows, 1, 2)  # [T, N_ATTR, cap]


def _dims_for(cam: Camera, cfg: RasterConfig, cap: int) -> _Dims:
    ty, tx = tile_grid_shape(cam, cfg)
    K = min(cfg.chunk, cap)
    assert cap % K == 0 and (K & (K - 1)) == 0, "chunk must be power of two"
    n_chunks = cap // K
    return _Dims(
        ts=cfg.tile,
        px=cfg.tile * cfg.tile,
        cap=cap,
        K=K,
        n_chunks=n_chunks,
        tx=tx,
        n_tiles=ty * tx,
        exact=cfg.exact_stop,
        bf16=getattr(cfg, "blend_bf16", False),
        unroll=min(getattr(cfg, "chunk_unroll", 4), n_chunks),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _blend(packed, counts, dims: _Dims, interpret: bool):
    out, _ = _blend_fwd_impl(packed, counts, dims, interpret)
    return out


def _blend_fwd_impl(packed, counts, dims: _Dims, interpret: bool):
    T = dims.n_tiles
    tri_dtype = jnp.bfloat16 if dims.bf16 else jnp.float32
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
            scratch_shapes=[
                pltpu.VMEM((8, dims.px), jnp.float32),
                pltpu.VMEM((8, dims.px), jnp.float32),
                pltpu.VMEM((dims.K, dims.K), tri_dtype),
            ],
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
    tri_dtype = jnp.bfloat16 if dims.bf16 else jnp.float32
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
                (1, 16, dims.cap), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, dims.px), jnp.float32),
                pltpu.VMEM((8, dims.px), jnp.float32),
                pltpu.VMEM((dims.K, dims.K), tri_dtype),
                pltpu.VMEM((dims.K, dims.K), tri_dtype),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T, 16, dims.cap), jnp.float32),
        interpret=interpret,
    )(counts, packed, chunk_t, g_out)
    # d packed: the kernel already emits gradients in the packed row layout
    # (rows 0.._N_GRAD-1, zero-padded to 16); trim to N_ATTR rows.
    return grads[:, :N_ATTR, :], None


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
    if not interpret:
        # Mosaic requires lane-dim dynamic-slice offsets (c*K) to be
        # 128-multiples — round-1 dryrun regression.
        assert dims.K % 128 == 0, (
            f"chunk must be a multiple of 128 on TPU (got {dims.K}); "
            "use chunk=128 and tile_capacity a multiple of 128"
        )
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
