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
# bf16 round-to-nearest of the 0.99 alpha clamp: under elem16 the stored
# clamped alphas equal exactly this value, so the unclamped-gradient gate
# compares against it (a Python constant — jnp.bfloat16(0.99) would trace).
BF16_CLAMP = 0.98828125

# packed attribute rows. The opacity row is pre-multiplied by the live mask
# (dead instances blend with alpha exactly 0), so the kernels never touch
# the _LIVE row — it is kept for the XLA fallback path.
_MU, _MV, _CA, _CB, _CC, _OP, _R, _G, _B, _Z, _LIVE = range(11)
N_ATTR = 16  # padded to a full f32 sublane tile (8|16): the pack gather and
#   the instance-grad rows then move 64B-aligned rows, and the kernel's
#   attribute slab stays tileable.

# instance-gradient columns
_N_GRAD = 10  # d_mu, d_mv, d_ca, d_cb, d_cc, d_op, d_r, d_g, d_b, d_z


class _Dims(NamedTuple):
    ts_x: int  # tile width in pixels (lane-major axis of the pixel basis)
    ts_y: int  # tile height in pixels
    px: int  # ts_x * ts_y
    cap: int
    K: int
    n_chunks: int
    tx: int  # tiles per row
    n_tiles: int
    exact: bool  # CUDA-exact early-stop semantics (see RasterConfig)
    bf16: bool  # bf16 MXU inputs for the triangular cumsum matmuls
    elem16: bool  # bf16 elementwise slab math on the fast (non-exact) paths
    unroll: int  # chunk steps per while-loop iteration (fixed ~340ns/iter
    #   loop overhead dominates the chunk math, so early exit is checked at
    #   super-chunk granularity and the inner steps are Python-unrolled)
    group: int  # chunks per grid step in the FLAT blend kernels
    debug: bool = False  # fused kernel writes per-tile diagnostics into the
    #   spare loss-row lanes (RasterConfig.debug_loss; triage only)
    cbatch: int = 1  # chunks whose K-LINEAR math is batched into one slab
    #   per super-step in the fused fast kernel (r5: the measured ~0.8us
    #   per-chunk floor is matmul-ISSUE overhead, not FLOPs — batching the
    #   grows/dg00/phi/Srows/WG/accum passes over cbatch*K rows amortizes
    #   it; the K^2 cumsum/suffix matmuls stay per-chunk). Early exit
    #   coarsens to cbatch granularity.


def _pixel_basis(dims: _Dims, t) -> jnp.ndarray:
    """[8, px] tile-LOCAL polynomial basis: 1, pu, pv, pu^2, pu*pv, pv^2, 0, 0."""
    px, tsx = dims.px, dims.ts_x
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    pu = (pix % tsx).astype(jnp.float32)
    pv = (pix // tsx).astype(jnp.float32)
    one = jnp.ones((1, px), jnp.float32)
    zero = jnp.zeros((1, px), jnp.float32)
    return jnp.concatenate([one, pu, pv, pu * pu, pu * pv, pv * pv, zero, zero], 0)


def _tri(K: int, strict_lower: bool, dtype) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return ((r > c) if strict_lower else (r < c)).astype(dtype)


# TPU MXU caveat: preferred_element_type=f32 alone still rounds the INPUTS
# to bf16 at DEFAULT precision. The polynomial-basis matmul reconstructs
# ln(alpha) from cancelling terms of magnitude O(100-1000), so bf16 input
# rounding injects O(1) absolute error into the exponent (r2 bug: compiled
# renders diverged 0.65 in color from the XLA blend while CPU tests passed).
# All kernel contractions therefore request full-f32 passes explicitly;
# the opt-in dims.bf16 mode keeps the cumsum/suffix matmuls in bf16 (their
# operands are O(1) log-transmittances — bounded relative error, no
# cancellation).
_PREC = jax.lax.Precision.HIGHEST


# bf16-operand dots must PIN precision=DEFAULT: a global
# jax_default_matmul_precision=highest would otherwise upgrade them to an
# fp32 contract over bf16 vectors, which Mosaic rejects ("Bad lhs type").
_DEF = jax.lax.Precision.DEFAULT


def _mm(a, b):
    if a.dtype == jnp.bfloat16 or b.dtype == jnp.bfloat16:
        return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_DEF)
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_PREC)


def _mm_split2_rev(a_bf16: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a @ b with ``a`` ALREADY bf16 and exactly representable (0/1
    triangular masks — cast once per kernel, not per chunk) and ``b``
    manually 2-pass split.

    The MXU accumulates in f32, so with a exact the only error is the
    16-bit truncation of ``b`` — ~2^-16 relative, ample for same-signed
    log-transmittance sums — at 2 bf16 passes instead of HIGHEST's 6.
    """
    hi = b.astype(jnp.bfloat16)
    lo = (b - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(a_bf16, hi, preferred_element_type=jnp.float32, precision=_DEF) + jnp.dot(
        a_bf16, lo, preferred_element_type=jnp.float32, precision=_DEF
    )


def _dg00_split(a: jnp.ndarray, b_bf16: jnp.ndarray, passes: int = 3) -> jnp.ndarray:
    """dot_general contracting dim 0 of both, via a ``passes``-way manual
    bf16 split of ``a`` against an exactly-bf16-representable ``b_bf16``
    (the integer pixel basis: with tile=16 its entries are integers <= 225
    — exact in bf16's 8 mantissa bits; pre-cast once per kernel). 3 passes
    give ~f24 products — enough for the cancelling O(1000) terms of
    ln(alpha) — at half HIGHEST's cost (Mosaic has no native bf16x3
    Precision.HIGH lowering)."""
    resid = a
    acc = None
    for _ in range(passes):
        part = resid.astype(jnp.bfloat16)
        resid = resid - part.astype(jnp.float32)
        term = jax.lax.dot_general(
            part, b_bf16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        )
        acc = term if acc is None else acc + term
    return acc


def _dgT_split2(a_bf16: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Contraction over the LAST dim of both ([m,px] x [n,px] -> [m,n])
    with ``a`` exact-bf16 (pixel basis) and ``b`` 2-pass split — the
    backward's pixel reductions."""
    hi = b.astype(jnp.bfloat16)
    lo = (b - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    return jax.lax.dot_general(
        a_bf16, hi, dn, preferred_element_type=jnp.float32, precision=_DEF
    ) + jax.lax.dot_general(
        a_bf16, lo, dn, preferred_element_type=jnp.float32, precision=_DEF
    )


def _mm_t(a, b):
    """Contraction over the LAST dim of both: [m, k] x [n, k] -> [m, n]."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_PREC,
    )


def _grows(chunk, ox, oy):
    """[8, K] quadratic coefficient rows g0..g5 (+2 zero pad) for one tile's
    chunk, with ln(opacity) folded into g0 — the operand of the polynomial-
    basis matmul that yields ln(alpha) (see module docstring)."""
    row = lambda r: chunk[r : r + 1, :]
    mu = row(_MU) - ox
    mv = row(_MV) - oy
    ca, cb, cc = row(_CA), row(_CB), row(_CC)
    op = row(_OP)
    K = chunk.shape[1]
    ln_op = jnp.log(jnp.maximum(op, 1e-12))
    g0 = -0.5 * (ca * mu * mu + cc * mv * mv) - cb * mu * mv + ln_op
    g1 = ca * mu + cb * mv
    g2 = cc * mv + cb * mu
    return jnp.concatenate(
        [g0, g1, g2, -0.5 * ca, -cb, -0.5 * cc,
         jnp.zeros((2, K), jnp.float32)], 0
    )


def _chunk_fast(chunk, tri_l, pbas, T_in, ox, oy, dims: _Dims):
    """Lean non-exact per-chunk math on the [K, px] slab (see the fast
    fused kernel's docstring for the deviation argument): no per-element
    power<=0 / done / STOP_T gates, T_out by row extraction. Returns
    (alpha, apply-free weights w, T_pref, T_out).

    Every full-slab [K, px] elementwise pass costs ~34 ns on v5e (32 vregs
    x 1 op/cycle), which is what actually dominates this kernel (ablation:
    transcendentals and MXU passes are each <10% of the time) — so this
    function and its callers count passes. 1-alpha is never materialized
    as a slab: T_out needs only its last row, and the crossing test uses
    T_pref - w (== T_pref*(1-alpha)).

    ``dims.elem16`` runs the slab chain in bfloat16 (packed 2/lane-slot on
    the VPU): ln(alpha) stays the f32 MXU output — the cancellation-heavy
    part — and is rounded ONCE; the downstream alpha/s/T/w chain carries
    ~0.4% relative error into weights whose gradients are summed over
    1e5-1e8 contributions. The transmittance carry between chunks (T_in /
    T_out) stays f32."""
    ln_alpha = _dg00_split(_grows(chunk, ox, oy), pbas)
    return _fast_post(ln_alpha, tri_l, T_in, dims)


def _fast_post(ln_alpha, tri_l, T_in, dims: _Dims):
    """The per-lane chain downstream of ln(alpha): clamp/gate -> log1p ->
    triangular-cumsum matmul -> prefix transmittance / weights / exit row.
    Shared by the square fast chunk and the paired-rect kernel (whose only
    difference is how ln_alpha is assembled)."""
    K = ln_alpha.shape[0]
    if dims.elem16:
        # Transcendentals and the log-domain chain stay f32: bf16 error in
        # s = log1p(-alpha) is AMPLIFIED by exp(cumsum) (3.5% summed-loss
        # error measured with a bf16 s), so the cumsum keeps the f32
        # fast path's 2-pass split. Quantization enters each value ONCE —
        # at the alpha / T_pref / w casts that feed the bf16 slab stores
        # and MXU passes.
        e = jnp.bfloat16
        raw = jnp.exp(ln_alpha)
        alpha_f = jnp.where(raw >= MIN_ALPHA, jnp.minimum(raw, 0.99), 0.0)
        s = jnp.log1p(-alpha_f)
        cum_excl = _mm_split2_rev(tri_l, s)
        T_pref_f = T_in * jnp.exp(cum_excl)
        alpha = alpha_f.astype(e)
        # T_pref stays f32: its only consumers are the median-crossing /
        # is_med threshold tests, where bf16 rounding near T=0.5 flips the
        # selected splat and injects O(inter-splat-gap) depth jumps.
        w = (alpha_f * T_pref_f).astype(e)
        T_out = T_pref_f[K - 1 : K, :] * (1.0 - alpha_f[K - 1 : K, :])
        return alpha, w, T_pref_f, T_out
    raw = jnp.exp(ln_alpha)
    alpha = jnp.where(raw >= MIN_ALPHA, jnp.minimum(raw, 0.99), 0.0)
    s = jnp.log1p(-alpha)
    if dims.bf16:
        cum_excl = _mm(tri_l, s.astype(jnp.bfloat16))
    else:
        cum_excl = _mm_split2_rev(tri_l, s)
    T_pref = T_in * jnp.exp(cum_excl)
    w = alpha * T_pref
    T_out = T_pref[K - 1 : K, :] * (1.0 - alpha[K - 1 : K, :])
    return alpha, w, T_pref, T_out


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
    ln_alpha = _dg00_split(grows, pbas)  # [K, px]
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
        cum_excl = _mm_split2_rev(tri_l, s)  # tri_l is bf16 (exact 0/1)
    T_pref = T_in * jnp.exp(cum_excl)  # [K, px]
    one_minus = 1.0 - alpha
    if dims.exact:
        crosses = contrib & (T_pref * one_minus < STOP_T)
        cf = crosses.astype(jnp.bfloat16)
        blocked = (
            _mm(tri_l, cf) + cf.astype(jnp.float32)
        ) > 0.5  # inclusive cumulative any (0/1 operands: bf16 is exact)
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
    ox = ((t % dims.tx) * dims.ts_x).astype(jnp.float32)
    oy = ((t // dims.tx) * dims.ts_y).astype(jnp.float32)

    # Scratch persists across the sequential grid: build the (tile-
    # independent) pixel basis and triangular masks ONCE — rebuilding +
    # re-casting the [K, K] masks per tile costs several ms/iteration.
    @pl.when(t == 0)
    def _():
        pbas_ref[...] = _pixel_basis(dims, t).astype(pbas_ref.dtype)
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
                preferred_element_type=jnp.float32, precision=_PREC,
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
    ox = ((t % dims.tx) * dims.ts_x).astype(jnp.float32)
    oy = ((t // dims.tx) * dims.ts_y).astype(jnp.float32)

    @pl.when(t == 0)
    def _():
        pbas_ref[...] = _pixel_basis(dims, t).astype(pbas_ref.dtype)
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
            preferred_element_type=jnp.float32, precision=_PREC,
        )  # [K, px]
        wphi = w * phi
        if dims.bf16:
            suffix = _mm(utri_ref[...], wphi.astype(jnp.bfloat16)) + R
        else:
            suffix = _mm_split2_rev(utri_ref[...], wphi) + R
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = jnp.where(apply, T_pref * phi - suffix / one_minus, 0.0)
        # alpha = min(0.99, op * exp(power)); grad gated off when clamped.
        d_power = jnp.where(apply & unclamped, d_alpha, 0.0) * alpha
        # All pixel reductions through the polynomial basis, emitted in
        # [1, K] ROW space (column-layout algebra costs ~2x the whole bwd):
        # Srows[b] = sum_px d_power * basis_b  (rows 6,7 of pbas are zero).
        Srows = _dgT_split2(pbas_ref[...], d_power)  # [8, K]
        WGrows = jax.lax.dot_general(
            G5, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
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

    ONE row gather of a pre-packed [C+1, 16] matrix (64B-aligned rows; 12
    separate element gathers cost ~115ms at VGA scale, the aligned row
    gather ~13ms). Padding entries (``bins.indices == -1``) are redirected
    to a zero SENTINEL row (row C) instead of masked after the fact — the
    r1 implementation's three post-gather ``.at[:, :, k].multiply`` passes
    over the [T, cap, 12] slab cost ~20ms/iter on their own. Dead rows
    blend with opacity exactly 0, which is all the kernels gate on.
    """
    T, cap = bins.indices.shape
    C = prep.depth.shape[0]
    vf = prep.valid.astype(jnp.float32)
    z = jnp.zeros_like(prep.opacity)
    cols = jnp.stack(
        [
            prep.mean2d[:, 0],
            prep.mean2d[:, 1],
            # conic rows masked by validity: invalid conics can be garbage
            # (det<=0) and the lean fused path has no per-element power gate
            prep.conic[:, 0] * vf,
            prep.conic[:, 1] * vf,
            prep.conic[:, 2] * vf,
            prep.opacity * vf,
            prep.color[:, 0],
            prep.color[:, 1],
            prep.color[:, 2],
            jnp.where(prep.valid, prep.depth, 0.0),
            vf,
            z, z, z, z, z,
        ],
        axis=1,
    )  # [C, N_ATTR=16]
    cols = jnp.concatenate([cols, jnp.zeros((1, N_ATTR), jnp.float32)], axis=0)
    k = jnp.arange(cap, dtype=jnp.int32)
    dead = (bins.indices < 0) | (k[None, :] >= bins.counts[:, None])
    idx = jnp.where(dead, C, bins.indices)
    rows = cols[idx.reshape(-1)].reshape(T, cap, N_ATTR)
    return jnp.swapaxes(rows, 1, 2)  # [T, N_ATTR, cap]


def _dims_for(cam: Camera, cfg: RasterConfig, cap: int) -> _Dims:
    ty, tx = tile_grid_shape(cam, cfg)
    K = min(cfg.chunk, cap)
    assert cap % K == 0 and (K & (K - 1)) == 0, "chunk must be power of two"
    n_chunks = cap // K
    return _Dims(
        ts_x=cfg.tile_w_px,
        ts_y=cfg.tile_h_px,
        px=cfg.tile_w_px * cfg.tile_h_px,
        cap=cap,
        K=K,
        n_chunks=n_chunks,
        tx=tx,
        n_tiles=ty * tx,
        exact=cfg.exact_stop,
        bf16=getattr(cfg, "blend_bf16", False),
        elem16=getattr(cfg, "elem_bf16", False) and not cfg.exact_stop,
        unroll=min(getattr(cfg, "chunk_unroll", 4), n_chunks),
        group=max(1, getattr(cfg, "flat_group", 1)),
        debug=getattr(cfg, "debug_loss", False),
        cbatch=max(1, min(getattr(cfg, "fused_chunk_batch", 1), n_chunks))
        if not cfg.exact_stop
        else 1,
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
            scratch_shapes=[
                pltpu.VMEM((8, dims.px), jnp.float32),  # accumulators
                pltpu.VMEM((8, dims.px), jnp.bfloat16),  # pixel basis (exact)
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),  # tri (exact 0/1)
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
                pltpu.VMEM((8, dims.px), jnp.bfloat16),
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
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
        a = a.reshape(ty, tx, dims.ts_y, dims.ts_x)
        a = jnp.swapaxes(a, 1, 2).reshape(ty * dims.ts_y, tx * dims.ts_x)
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


# ---------------------------------------------------------------------------
# Fused tracking step: forward + loss + cotangents + backward in ONE launch.
#
# The split fwd/bwd pair above re-runs the whole per-chunk forward math in
# the backward (the CUDA kernel does the same: backward.cu:399 reconstructs
# T back-to-front) and round-trips per-chunk transmittance through HBM. For
# TRACKING the loss is tile-local (masked L1 sums, src/Render.cc:1096 —
# mask = rendered-alpha > 0.99 & gt-depth > 0, reductions are SUMS), so the
# entire iteration collapses into one kernel: phase A runs the forward and
# keeps per-chunk (applied-alpha, prefix-transmittance) slabs in VMEM
# scratch, the cotangent block derives the per-pixel L1 signs from the
# finished accumulators and the gt tile, and phase B walks the chunks
# backward reusing the stored slabs — no recompute, no residual traffic,
# no separate XLA loss/cotangent program.
# ---------------------------------------------------------------------------


def _fused_track_kernel_exact(
    counts_ref, tids_ref, packed_ref, gt_ref, grad_ref, loss_ref,
    alpha_scr, tpref_scr, acc_ref, pbas_ref, tri_ref, utri_ref,
    *, dims: _Dims, im_w: float, depth_w: float, use_sur: bool,
):
    t = pl.program_id(0)
    count = counts_ref[t]
    px, K, U = dims.px, dims.K, dims.unroll
    # tids maps the local row to its GLOBAL tile id (identity single-chip;
    # a shard's strided tile subset under the mesh tracking path).
    tg = tids_ref[t]
    ox = ((tg % dims.tx) * dims.ts_x).astype(jnp.float32)
    oy = ((tg // dims.tx) * dims.ts_y).astype(jnp.float32)

    @pl.when(t == 0)
    def _():
        pbas_ref[...] = _pixel_basis(dims, t).astype(pbas_ref.dtype)
        tri_ref[...] = _tri(K, True, tri_ref.dtype)
        utri_ref[...] = _tri(K, False, utri_ref.dtype)

    acc_ref[...] = jnp.zeros((8, px), jnp.float32)
    acc_ref[6, :] = jnp.ones((px,), jnp.float32)

    n_chunks_live = jnp.minimum((count + K - 1) // K, dims.n_chunks).astype(jnp.int32)
    n_super = (n_chunks_live + U - 1) // U

    # ---- phase A: forward, stashing per-chunk residuals in VMEM ----
    def cond(sc):
        return (sc < n_super) & (jnp.sum(acc_ref[7, :]) < px - 0.5)

    def body(sc):
        acc = acc_ref[0:6, :]
        T = acc_ref[6:7, :]
        done = acc_ref[7:8, :] > 0.5
        for j in range(U):
            c = sc * U + j
            chunk = packed_ref[0, :, pl.ds(c * K, K)]
            _b, alpha, _unc, apply, T_pref, w, T_out, done_out = _chunk_common(
                chunk, tri_ref[...], pbas_ref[...], T, done, ox, oy, dims
            )
            alpha_scr[pl.ds(c * K, K), :] = jnp.where(apply, alpha, 0.0)
            tpref_scr[pl.ds(c * K, K), :] = T_pref
            row = lambda r: chunk[r : r + 1, :]
            ones = jnp.ones((1, K), jnp.float32)
            A6 = jnp.concatenate(
                [row(_R), row(_G), row(_B), row(_Z), ones,
                 jnp.zeros((1, K), jnp.float32)], 0
            )
            accum = _mm(A6, w)
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, px), 0)
            is_med = apply & (T_pref > 0.5)
            last = jnp.max(jnp.where(is_med, k_iota + 1, 0), axis=0, keepdims=True)
            onehot = ((k_iota + 1) == last).astype(jnp.float32)
            z_sel = jax.lax.dot_general(
                row(_Z), onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC,
            )
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

    # chunks never entered contribute nothing: zero their residual slabs
    def zero_body(c, _):
        alpha_scr[pl.ds(c * K, K), :] = jnp.zeros((K, px), jnp.float32)
        return 0

    jax.lax.fori_loop(sc_end * U, dims.n_chunks, zero_body, 0)

    # ---- cotangents + loss partials from the finished accumulators ----
    Cr, Cg, Cb = acc_ref[0:1, :], acc_ref[1:2, :], acc_ref[2:3, :]
    D = acc_ref[3:4, :]
    S = acc_ref[4:5, :]
    Med = acc_ref[5:6, :]
    gtr, gtg, gtb = gt_ref[0, 0:1, :], gt_ref[0, 1:2, :], gt_ref[0, 2:3, :]
    gtd = gt_ref[0, 3:4, :]
    mask = ((S > 0.99) & (gtd > 0.0)).astype(jnp.float32)
    dr, dg, db = Cr - gtr, Cg - gtg, Cb - gtb
    loss_color = jnp.sum((jnp.abs(dr) + jnp.abs(dg) + jnp.abs(db)) * mask)
    depth_pred = Med if use_sur else D
    loss_depth = jnp.sum(jnp.abs(depth_pred - gtd) * mask)
    gcoef = im_w * mask
    # G5 rows: dL/d{Cr,Cg,Cb,D,S}. Median depth carries no gradient
    # (include/Rasterizer.cuh:209-212); the blended-depth channel does.
    dcoef = (0.0 if use_sur else depth_w) * mask
    G5 = jnp.concatenate(
        [
            gcoef * jnp.sign(dr),
            gcoef * jnp.sign(dg),
            gcoef * jnp.sign(db),
            dcoef * jnp.sign(D - gtd),
            jnp.zeros((1, px), jnp.float32),
        ],
        0,
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    loss_ref[0, :, :] = jnp.where(
        lane == 0, im_w * loss_color,
        jnp.where(lane == 1, depth_w * loss_depth, 0.0),
    )

    # ---- phase B: backward over stored residuals (no recompute) ----
    grad_ref[...] = jnp.zeros(grad_ref.shape, grad_ref.dtype)
    # suffix accumulator: R = sum over later chunks of w*phi; bg=0 and no
    # final-T cotangent in the tracking loss, so R starts at zero.
    acc_ref[7, :] = jnp.zeros((px,), jnp.float32)

    def chunk_grad(c, R):
        alpha_a = alpha_scr[pl.ds(c * K, K), :]  # [K, px] applied alpha
        T_pref = tpref_scr[pl.ds(c * K, K), :]
        apply = alpha_a > 0.0
        # where-guard: tpref_scr is uninitialized for never-entered chunks
        # (alpha slab zeroed instead) — a bare product would leak NaNs.
        w = jnp.where(apply, alpha_a * T_pref, 0.0)
        chunk = packed_ref[0, :, pl.ds(c * K, K)]
        row = lambda r: chunk[r : r + 1, :]
        ones = jnp.ones((1, K), jnp.float32)
        A5 = jnp.concatenate([row(_R), row(_G), row(_B), row(_Z), ones], 0)
        phi = jax.lax.dot_general(
            A5, G5, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )
        wphi = w * phi
        if dims.bf16:
            suffix = _mm(utri_ref[...], wphi.astype(jnp.bfloat16)) + R
        else:
            suffix = _mm_split2_rev(utri_ref[...], wphi) + R
        one_minus = jnp.maximum(1.0 - alpha_a, 1e-6)
        d_alpha = jnp.where(apply, T_pref * phi - suffix / one_minus, 0.0)
        unclamped = alpha_a < 0.99
        d_power = jnp.where(apply & unclamped, d_alpha, 0.0) * alpha_a
        Srows = _dgT_split2(pbas_ref[...], d_power)
        WGrows = jax.lax.dot_general(
            G5, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )
        S0 = Srows[0:1, :]
        S1u = Srows[1:2, :]
        S1v = Srows[2:3, :]
        S2uu = Srows[3:4, :]
        S2uv = Srows[4:5, :]
        S2vv = Srows[5:6, :]
        mu = row(_MU) - ox
        mv = row(_MV) - oy
        ca, cb, cc, op = row(_CA), row(_CB), row(_CC), row(_OP)
        E0 = mu * S0 - S1u
        E1 = mv * S0 - S1v
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
        )
        grad_ref[0, :, pl.ds(c * K, K)] = G16
        return R + jnp.sum(wphi, axis=0, keepdims=True)

    U2 = dims.unroll

    def bwd_body(i, _):
        sc = (sc_end - 1) - i

        @pl.when(sc >= 0)
        def _():
            R = acc_ref[7:8, :]
            for j in range(U2 - 1, -1, -1):
                R = chunk_grad(sc * U2 + j, R)
            acc_ref[7:8, :] = R

        return 0

    jax.lax.fori_loop(0, n_super, bwd_body, 0)


def _fused_track_kernel_fast(
    counts_ref, tids_ref, packed_ref, gt_ref, grad_ref, loss_ref,
    alpha_scr, w_scr, acc_ref, pbas_ref, tri_ref, utri_ref, st_ref,
    *, dims: _Dims, im_w: float, depth_w: float, use_sur: bool, B: int,
):
    """Lean fast-path fused tracking iteration, B tiles per grid step.

    Rewrites of the exact kernel, all within the non-exact deviation budget
    (<= 1e-4 in blended outputs; compiled-vs-XLA gated by scripts/tpu_smoke):

    - NO per-element ``power <= 0`` gate: packed conic rows are zeroed for
      invalid instances (see ``_pack_instances``/``preprocess_instances``),
      so garbage quadratics cannot go positive and the single
      ``alpha >= MIN_ALPHA`` test gates contribution. Removes the [K,1]
      column-broadcast compare from the hot loop.
    - NO ``done``/STOP_T masking per element: once a pixel's transmittance
      is below 1e-4, the remaining weights sum to < 1e-4 by construction
      (sum w <= T). Early exit fires at CHUNK granularity (below).
    - Median depth by TRANSMITTANCE CROSSING: the unique instance with
      T_pref > 0.5 and T_pref*(1-alpha) <= 0.5 (monotone T => at most one
      per pixel over the whole blend), accumulated with a plain add — no
      iota/max/one-hot chain. Identical to CUDA's "last write while
      T > 0.5" (forward.cu:375-379) wherever T actually crosses 0.5, which
      the alpha>0.99 loss mask guarantees for every pixel in the loss.
    - Chunk-exit transmittance by ROW EXTRACTION: T_out = T_pref[K-1] *
      (1-alpha[K-1]) instead of a masked re-reduction.
    - B tiles per grid step amortize the fixed per-step cost; scratch is
      reused sequentially (phase A+B complete per tile).
    - PER-CHUNK early exit (the CUDA ``__syncthreads_count(done)`` break,
      ``forward.cu:291-296``): each chunk's ~2us of slab math is wrapped in
      ``pl.when(not saturated)`` against an SMEM done flag updated from the
      chunk-exit transmittance. On opaque scenes most tiles saturate after
      1-2 chunks, so this cuts executed chunk-units roughly in half versus
      exiting only at super-chunk (unroll) granularity. ``st_ref`` (SMEM)
      carries [executed-chunk count, done flag] per tile; phase B walks
      exactly the executed chunks, also ``pl.when``-gated.
    """
    pid = pl.program_id(0)
    px, K, U = dims.px, dims.K, dims.unroll

    @pl.when(pid == 0)
    def _():
        pbas_ref[...] = _pixel_basis(dims, 0).astype(pbas_ref.dtype)
        tri_ref[...] = _tri(K, True, tri_ref.dtype)
        utri_ref[...] = _tri(K, False, utri_ref.dtype)

    grad_ref[...] = jnp.zeros(grad_ref.shape, grad_ref.dtype)

    for b in range(B):
        t = pid * B + b
        count = counts_ref[t]
        tg = tids_ref[t]  # global tile id (identity unless mesh-sharded)
        ox = ((tg % dims.tx) * dims.ts_x).astype(jnp.float32)
        oy = ((tg // dims.tx) * dims.ts_y).astype(jnp.float32)

        acc_ref[...] = jnp.zeros((8, px), jnp.float32)
        acc_ref[6, :] = jnp.ones((px,), jnp.float32)
        st_ref[0] = 0  # executed-chunk count (c_end)
        st_ref[1] = 0  # all-pixels-saturated flag

        n_chunks_live = jnp.minimum(
            (count + K - 1) // K, dims.n_chunks
        ).astype(jnp.int32)
        n_super = (n_chunks_live + U - 1) // U

        # ---- phase A ----
        def do_chunk(c):
            T = acc_ref[6:7, :]
            chunk = packed_ref[b, :, pl.ds(c * K, K)]
            row = lambda r: chunk[r : r + 1, :]
            z = row(_Z)
            alpha, w, T_pref, T_out = _chunk_fast(
                chunk, tri_ref[...], pbas_ref[...], T, ox, oy, dims
            )
            alpha_scr[pl.ds(c * K, K), :] = alpha
            w_scr[pl.ds(c * K, K), :] = w
            edt = jnp.bfloat16 if dims.elem16 else jnp.float32
            ones = jnp.ones((1, K), jnp.float32)
            A5 = jnp.concatenate(
                [row(_R), row(_G), row(_B), z, ones], 0
            ).astype(edt)
            accum = _mm(A5, w)  # [5, px] f32 (MXU accumulation)
            # crossing median (self-masking: alpha=0 => T_next == T_pref, no
            # cross); T_next = T_pref*(1-alpha) reuses w instead of a 1-alpha
            # slab. T_pref is f32 in BOTH modes — bf16 threshold tests near
            # T=0.5 flip the selected splat (O(gap) depth error).
            cross = ((T_pref > 0.5) & (T_pref - w <= 0.5)).astype(edt)
            z_sel = _mm(z.astype(edt), cross)  # [1, px] f32
            acc_ref[0:5, :] = acc_ref[0:5, :] + accum
            acc_ref[5:6, :] = acc_ref[5:6, :] + z_sel
            acc_ref[6:7, :] = T_out
            st_ref[0] = (c + 1).astype(jnp.int32)
            st_ref[1] = (jnp.max(T_out) < STOP_T).astype(jnp.int32)

        # ---- batched phase A (dims.cbatch > 1): the K-LINEAR math (grows,
        # ln_alpha, alpha/s, accumulation, crossing) runs once per SUPER of
        # UB chunks on [UB*K, px] slabs — amortizing the ~0.8us per-chunk
        # matmul-issue floor — while the K^2 cumsum stays per chunk with a
        # cheap [1, px] T carry. Dead rows in a partially-live super are
        # sentinel zeros (alpha == 0) and self-mask, exactly as dead rows
        # within a chunk already do; early exit coarsens to super
        # granularity.
        UB = dims.cbatch

        def do_super(sc):
            c0 = sc * UB
            T = acc_ref[6:7, :]
            chunkU = packed_ref[b, :, pl.ds(c0 * K, UB * K)]
            rowU = lambda r: chunkU[r : r + 1, :]
            zU = rowU(_Z)
            ln_alphaU = _dg00_split(
                _grows(chunkU, ox, oy), pbas_ref[...]
            )  # [UB*K, px]
            raw = jnp.exp(ln_alphaU)
            alpha_f = jnp.where(raw >= MIN_ALPHA, jnp.minimum(raw, 0.99), 0.0)
            sU = jnp.log1p(-alpha_f)
            tprefs = []
            for j in range(UB):
                s_j = sU[j * K : (j + 1) * K, :]
                if dims.bf16 and not dims.elem16:
                    cum_j = _mm(tri_ref[...], s_j.astype(jnp.bfloat16))
                else:
                    cum_j = _mm_split2_rev(tri_ref[...], s_j)
                T_pref_j = T * jnp.exp(cum_j)
                T = T_pref_j[K - 1 : K, :] * (
                    1.0 - alpha_f[(j + 1) * K - 1 : (j + 1) * K, :]
                )
                tprefs.append(T_pref_j)
            T_prefU = jnp.concatenate(tprefs, 0)  # [UB*K, px] f32
            wU_f = alpha_f * T_prefU
            edt = jnp.bfloat16 if dims.elem16 else jnp.float32
            alpha_scr[pl.ds(c0 * K, UB * K), :] = alpha_f.astype(edt)
            w_scr[pl.ds(c0 * K, UB * K), :] = wU_f.astype(edt)
            ones = jnp.ones((1, UB * K), jnp.float32)
            A5U = jnp.concatenate(
                [rowU(_R), rowU(_G), rowU(_B), zU, ones], 0
            ).astype(edt)
            accum = _mm(A5U, wU_f.astype(edt))
            cross = ((T_prefU > 0.5) & (T_prefU - wU_f <= 0.5)).astype(edt)
            z_sel = _mm(zU.astype(edt), cross)
            acc_ref[0:5, :] = acc_ref[0:5, :] + accum
            acc_ref[5:6, :] = acc_ref[5:6, :] + z_sel
            acc_ref[6:7, :] = T
            st_ref[0] = (sc + 1).astype(jnp.int32)
            st_ref[1] = (jnp.max(T) < STOP_T).astype(jnp.int32)

        if UB > 1:
            n_super_b = (n_chunks_live + UB - 1) // UB

            def bodyb(sc, _):
                @pl.when(st_ref[1] == 0)
                def _():
                    do_super(sc)

                return 0

            jax.lax.fori_loop(0, n_super_b, bodyb, 0)
            sc_end = st_ref[0]  # executed SUPER count
        else:

            def body(sc, _):
                for j in range(U):
                    c = sc * U + j

                    @pl.when((c < n_chunks_live) & (st_ref[1] == 0))
                    def _():
                        do_chunk(c)

                return 0

            jax.lax.fori_loop(0, n_super, body, 0)
            sc_end = st_ref[0]  # exact executed chunk count (chunk units)

        # ---- cotangents + loss ----
        Cr, Cg, Cb = acc_ref[0:1, :], acc_ref[1:2, :], acc_ref[2:3, :]
        D = acc_ref[3:4, :]
        S = acc_ref[4:5, :]
        Med = acc_ref[5:6, :]
        gtr, gtg, gtb = gt_ref[b, 0:1, :], gt_ref[b, 1:2, :], gt_ref[b, 2:3, :]
        gtd = gt_ref[b, 3:4, :]
        mask = ((S > 0.99) & (gtd > 0.0)).astype(jnp.float32)
        dr, dg, db = Cr - gtr, Cg - gtg, Cb - gtb
        loss_color = jnp.sum((jnp.abs(dr) + jnp.abs(dg) + jnp.abs(db)) * mask)
        depth_pred = Med if use_sur else D
        loss_depth = jnp.sum(jnp.abs(depth_pred - gtd) * mask)
        gcoef = im_w * mask
        dcoef = (0.0 if use_sur else depth_w) * mask
        G5 = jnp.concatenate(
            [
                gcoef * jnp.sign(dr),
                gcoef * jnp.sign(dg),
                gcoef * jnp.sign(db),
                dcoef * jnp.sign(D - gtd),
                jnp.zeros((1, px), jnp.float32),
            ],
            0,
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
        if dims.debug:
            # Per-tile internals on the spare lanes (triage of compiled
            # Mosaic divergences; see RasterConfig.debug_loss). Host-side
            # ground truth for each lane is computable from the XLA blend
            # outputs + gt tiles.
            gtd_pos = (gtd > 0.0).astype(jnp.float32)
            dbg = [
                im_w * loss_color,                                   # 0
                depth_w * loss_depth,                                # 1
                jnp.sum(mask),                                       # 2
                jnp.sum(S),                                          # 3
                jnp.max(S),                                          # 4
                sc_end.astype(jnp.float32),                          # 5
                jnp.sum(gtd),                                        # 6
                jnp.sum(gtr + gtg + gtb),                            # 7
                jnp.sum(Cr + Cg + Cb),                               # 8
                jnp.sum(jnp.abs(dr) + jnp.abs(dg) + jnp.abs(db)),    # 9
                jnp.sum(jnp.abs(depth_pred - gtd) * gtd_pos),        # 10
                jnp.sum(depth_pred),                                 # 11
            ]
            out_row = jnp.zeros((1, px), jnp.float32)
            for i, v in enumerate(dbg):
                out_row = jnp.where(lane == i, v, out_row)
            loss_ref[b, :, :] = out_row
        else:
            loss_ref[b, :, :] = jnp.where(
                lane == 0, im_w * loss_color,
                jnp.where(lane == 1, depth_w * loss_depth, 0.0),
            )

        # ---- phase B ----
        acc_ref[7, :] = jnp.zeros((px,), jnp.float32)  # suffix accumulator R

        def chunk_grad(c):
            R = acc_ref[7:8, :]
            alpha_a = alpha_scr[pl.ds(c * K, K), :]
            w = w_scr[pl.ds(c * K, K), :]
            chunk = packed_ref[b, :, pl.ds(c * K, K)]
            row = lambda r: chunk[r : r + 1, :]
            ones = jnp.ones((1, K), jnp.float32)
            A5 = jnp.concatenate([row(_R), row(_G), row(_B), row(_Z), ones], 0)
            if dims.elem16:
                e = jnp.bfloat16
                phi = jax.lax.dot_general(
                    A5.astype(e), G5.astype(e), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )  # [K, px] f32
                wphi = w * phi.astype(e)
                suffix = _mm(utri_ref[...], wphi) + R  # f32
                # Mosaic (v5e) rejects cmpf/div on packed bf16 vectors: the
                # mask + ratio chain runs on ONE f32 upcast of the alpha
                # slab. Clamped alphas store bf16(0.99) exactly, so the
                # unclamped gate compares against that value, not 0.99.
                af = alpha_a.astype(jnp.float32)
                ratio = (af / (1.0 - af)).astype(e)
                d_power = jnp.where(
                    af < BF16_CLAMP, wphi - ratio * suffix.astype(e), e(0)
                )
                Srows = jax.lax.dot_general(  # single bf16 pass, no split
                    pbas_ref[...], d_power, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )
                WGrows = jax.lax.dot_general(
                    G5.astype(e), w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )
            else:
                phi = jax.lax.dot_general(
                    A5, G5, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC,
                )
                wphi = w * phi
                if dims.bf16:
                    suffix = _mm(utri_ref[...], wphi.astype(jnp.bfloat16)) + R
                else:
                    suffix = _mm_split2_rev(utri_ref[...], wphi) + R
                # d_power = alpha*d_alpha = alpha*T_pref*phi - alpha*suffix/(1-a)
                #         = w*phi - (alpha/(1-alpha))*suffix.
                # alpha == 0 self-masks (w == 0, ratio == 0); only the clamp
                # gate alpha < 0.99 needs an explicit where. alpha <= 0.99 =>
                # 1-alpha >= 0.01: no epsilon guard needed for the division.
                ratio = alpha_a / (1.0 - alpha_a)
                d_power = jnp.where(alpha_a < 0.99, wphi - ratio * suffix, 0.0)
                Srows = _dgT_split2(pbas_ref[...], d_power)
                WGrows = jax.lax.dot_general(
                    G5, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC,
                )
            S0 = Srows[0:1, :]
            S1u = Srows[1:2, :]
            S1v = Srows[2:3, :]
            S2uu = Srows[3:4, :]
            S2uv = Srows[4:5, :]
            S2vv = Srows[5:6, :]
            mu = row(_MU) - ox
            mv = row(_MV) - oy
            ca, cb, cc, op = row(_CA), row(_CB), row(_CC), row(_OP)
            E0 = mu * S0 - S1u
            E1 = mv * S0 - S1v
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
            )
            grad_ref[b, :, pl.ds(c * K, K)] = G16
            if dims.elem16:
                # bf16 reduction over K would accumulate in bf16; route the
                # suffix update through the MXU's f32 accumulator instead.
                rsum = _mm(jnp.ones((1, K), jnp.bfloat16), wphi)
            else:
                rsum = jnp.sum(wphi, axis=0, keepdims=True)
            acc_ref[7:8, :] = R + rsum

        def super_grad(sc):
            """Batched phase B over one super of UB chunks: ONE phi / Srows
            / WG / rsums matmul each on [UB*K, px] slabs; only the K^2
            suffix matmul stays per chunk (reverse order, with the [1, px]
            R carry reconstructed from per-chunk rsums)."""
            c0 = sc * UB
            R = acc_ref[7:8, :]
            alpha_a = alpha_scr[pl.ds(c0 * K, UB * K), :]
            w = w_scr[pl.ds(c0 * K, UB * K), :]
            chunkU = packed_ref[b, :, pl.ds(c0 * K, UB * K)]
            rowU = lambda r: chunkU[r : r + 1, :]
            ones = jnp.ones((1, UB * K), jnp.float32)
            A5U = jnp.concatenate(
                [rowU(_R), rowU(_G), rowU(_B), rowU(_Z), ones], 0
            )
            # block-ones [UB, UB*K]: row j = 1 on chunk j's columns — ONE
            # MXU pass yields every chunk's wphi row-sum.
            blk_r = jax.lax.broadcasted_iota(jnp.int32, (UB, UB * K), 0)
            blk_c = jax.lax.broadcasted_iota(jnp.int32, (UB, UB * K), 1)
            blk_ones = (blk_c // K == blk_r)
            if dims.elem16:
                e = jnp.bfloat16
                phi = jax.lax.dot_general(
                    A5U.astype(e), G5.astype(e), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )  # [UB*K, px] f32
                wphi = w * phi.astype(e)
                rsums = _mm(blk_ones.astype(e), wphi)  # [UB, px] f32
                sufs = []
                run = R
                for j in range(UB - 1, -1, -1):
                    s_j = _mm(
                        utri_ref[...], wphi[j * K : (j + 1) * K, :]
                    ) + run
                    sufs.append(s_j)
                    run = run + rsums[j : j + 1, :]
                suffix = jnp.concatenate(sufs[::-1], 0)  # [UB*K, px] f32
                af = alpha_a.astype(jnp.float32)
                ratio = (af / (1.0 - af)).astype(e)
                d_power = jnp.where(
                    af < BF16_CLAMP, wphi - ratio * suffix.astype(e), e(0)
                )
                Srows = jax.lax.dot_general(
                    pbas_ref[...], d_power, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )  # [8, UB*K]
                WGrows = jax.lax.dot_general(
                    G5.astype(e), w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )
            else:
                phi = jax.lax.dot_general(
                    A5U, G5, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC,
                )
                wphi = w * phi
                rsums = _mm(blk_ones.astype(jnp.float32), wphi)
                sufs = []
                run = R
                for j in range(UB - 1, -1, -1):
                    wj = wphi[j * K : (j + 1) * K, :]
                    if dims.bf16:
                        s_j = _mm(utri_ref[...], wj.astype(jnp.bfloat16)) + run
                    else:
                        s_j = _mm_split2_rev(utri_ref[...], wj) + run
                    sufs.append(s_j)
                    run = run + rsums[j : j + 1, :]
                suffix = jnp.concatenate(sufs[::-1], 0)
                ratio = alpha_a / (1.0 - alpha_a)
                d_power = jnp.where(alpha_a < 0.99, wphi - ratio * suffix, 0.0)
                Srows = _dgT_split2(pbas_ref[...], d_power)
                WGrows = jax.lax.dot_general(
                    G5, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC,
                )
            S0 = Srows[0:1, :]
            S1u = Srows[1:2, :]
            S1v = Srows[2:3, :]
            S2uu = Srows[3:4, :]
            S2uv = Srows[4:5, :]
            S2vv = Srows[5:6, :]
            mu = rowU(_MU) - ox
            mv = rowU(_MV) - oy
            ca, cb, cc = rowU(_CA), rowU(_CB), rowU(_CC)
            op = rowU(_OP)
            E0 = mu * S0 - S1u
            E1 = mv * S0 - S1v
            d_mu = -(ca * E0 + cb * E1)
            d_mv = -(cc * E1 + cb * E0)
            d_ca = -0.5 * (mu * mu * S0 - 2.0 * mu * S1u + S2uu)
            d_cb = -(mu * mv * S0 - mu * S1v - mv * S1u + S2uv)
            d_cc = -0.5 * (mv * mv * S0 - 2.0 * mv * S1v + S2vv)
            d_op = S0 / jnp.maximum(op, 1e-12)
            G16 = jnp.concatenate(
                [d_mu, d_mv, d_ca, d_cb, d_cc, d_op, WGrows[0:4, :],
                 jnp.zeros((16 - _N_GRAD, UB * K), jnp.float32)],
                axis=0,
            )
            grad_ref[b, :, pl.ds(c0 * K, UB * K)] = G16
            acc_ref[7:8, :] = run

        if UB > 1:

            def bwd_bodyb(i, _):
                sc = sc_end - 1 - i

                @pl.when(sc >= 0)
                def _():
                    super_grad(sc)

                return 0

            jax.lax.fori_loop(0, n_super_b, bwd_bodyb, 0)
        else:

            def bwd_body(i, _):
                for j in range(U):
                    c = (sc_end - 1) - (i * U + j)

                    @pl.when(c >= 0)
                    def _():
                        chunk_grad(c)

                return 0

            jax.lax.fori_loop(0, n_super, bwd_body, 0)


def tracking_loss_grad(
    packed: jnp.ndarray,  # [T, N_ATTR, cap] screen instances
    counts: jnp.ndarray,
    gt_tiles: jnp.ndarray,  # [T, 8, px] gt r,g,b,depth (+4 pad rows; see
    #   tile_gt_images) in tile layout
    cam: Camera,
    cfg: RasterConfig,
    im_weight: float,
    depth_weight: float,
    use_sur_depth: bool,
    interpret: bool | None = None,
    tile_ids: jnp.ndarray | None = None,
    return_tile_rows: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """One fused launch -> (image_l1*im_w, depth_l1*depth_w, d_packed).

    The loss is the masked-SUM tracking mix of ``RenderStartTraking``
    (``src/Render.cc:1075-1096``) WITHOUT the feature chi^2 term (tiny,
    handled in XLA by the caller).

    ``tile_ids`` maps each row of ``packed``/``gt_tiles`` to its GLOBAL
    tile id (for tile origins). Defaults to identity; the mesh tracking
    path (parallel/tracking.py) passes each shard's strided tile subset so
    ``packed.shape[0]`` can be a fraction of the camera's tile grid.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cap = packed.shape[2]
    dims = _dims_for(cam, cfg, cap)
    if not interpret:
        assert dims.K % 128 == 0, "chunk must be a multiple of 128 on TPU"
    T = packed.shape[0]
    if tile_ids is None:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
    tile_ids = tile_ids.astype(jnp.int32)

    if dims.exact:
        # CUDA-exact early-stop semantics: single-tile grid, full gating.
        grads, loss = pl.pallas_call(
            functools.partial(
                _fused_track_kernel_exact, dims=dims, im_w=float(im_weight),
                depth_w=float(depth_weight), use_sur=bool(use_sur_depth),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(T,),
                in_specs=[
                    pl.BlockSpec(
                        (1, N_ATTR, cap), lambda t, *_: (t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 8, dims.px), lambda t, *_: (t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, N_ATTR, cap), lambda t, *_: (t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, dims.px), lambda t, *_: (t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((cap, dims.px), jnp.float32),  # applied alpha
                    pltpu.VMEM((cap, dims.px), jnp.float32),  # prefix T
                    pltpu.VMEM((8, dims.px), jnp.float32),  # accumulators
                    pltpu.VMEM((8, dims.px), jnp.bfloat16),  # pixel basis
                    pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                    pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((T, N_ATTR, cap), jnp.float32),
                jax.ShapeDtypeStruct((T, 1, dims.px), jnp.float32),
            ],
            interpret=interpret,
        )(counts, tile_ids, packed, gt_tiles)
        image_l1 = jnp.sum(loss[:, 0, 0])
        depth_l1 = jnp.sum(loss[:, 0, 1])
        if return_tile_rows:
            return image_l1, depth_l1, grads, loss
        return image_l1, depth_l1, grads

    # Fast path: lean chunk math, B tiles per grid step.
    B = max(1, int(getattr(cfg, "fused_tiles_per_step", 1)))
    Tp = ((T + B - 1) // B) * B
    if Tp != T:
        packed = jnp.pad(packed, ((0, Tp - T), (0, 0), (0, 0)))
        gt_tiles = jnp.pad(gt_tiles, ((0, Tp - T), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, Tp - T))
        tile_ids = jnp.pad(tile_ids, (0, Tp - T))
    grads, loss = pl.pallas_call(
        functools.partial(
            _fused_track_kernel_fast, dims=dims, im_w=float(im_weight),
            depth_w=float(depth_weight), use_sur=bool(use_sur_depth), B=B,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tp // B,),
            in_specs=[
                pl.BlockSpec(
                    (B, N_ATTR, cap), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (B, 8, dims.px), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (B, N_ATTR, cap), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (B, 1, dims.px), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                # bf16 slabs under elem16 halve both VMEM and store traffic
                pltpu.VMEM(
                    (cap, dims.px),
                    jnp.bfloat16 if dims.elem16 else jnp.float32,
                ),  # alpha
                pltpu.VMEM(
                    (cap, dims.px),
                    jnp.bfloat16 if dims.elem16 else jnp.float32,
                ),  # w = alpha*T_pref
                pltpu.VMEM((8, dims.px), jnp.float32),  # accumulators
                pltpu.VMEM((8, dims.px), jnp.bfloat16),  # pixel basis
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                pltpu.SMEM((2,), jnp.int32),  # [c_end, saturated]
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Tp, N_ATTR, cap), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, dims.px), jnp.float32),
        ],
        interpret=interpret,
    )(counts, tile_ids, packed, gt_tiles)
    image_l1 = jnp.sum(loss[:, 0, 0])
    depth_l1 = jnp.sum(loss[:, 0, 1])
    if return_tile_rows:
        return image_l1, depth_l1, grads[:T], loss[:T]
    return image_l1, depth_l1, grads[:T]


def tile_gt_images(
    gt_color: jnp.ndarray,  # [H, W, 3]
    gt_depth: jnp.ndarray,  # [H, W]
    cam: Camera,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Pack gt color+depth into the kernel's [T, 4, px] tile layout.
    Out-of-image padding rows get depth 0 => masked out of the loss."""
    ty, tx = tile_grid_shape(cam, cfg)
    tsx, tsy = cfg.tile_w_px, cfg.tile_h_px
    Hp, Wp = ty * tsy, tx * tsx
    img = jnp.concatenate([gt_color, gt_depth[..., None]], axis=-1)  # [H, W, 4]
    img = jnp.pad(img, ((0, Hp - cam.height), (0, Wp - cam.width), (0, 0)))
    img = img.reshape(ty, tsy, tx, tsx, 4)
    img = jnp.transpose(img, (0, 2, 4, 1, 3))  # [ty, tx, 4, tsy, tsx]
    gt4 = img.reshape(ty * tx, 4, tsy * tsx)
    # Row dim padded 4 -> 8 (the native f32 sublane tile): a (B, 4, px)
    # VMEM block with px = 128 mis-lowers row indexing in hardware Mosaic
    # (the rect16x8 fused-loss divergence — the blend kernel, which takes
    # no gt block, was exact). Kernels read rows 0..3; the pad is inert.
    return jnp.pad(gt4, ((0, 0), (0, 4), (0, 0)))


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


# ---------------------------------------------------------------------------
# Flat-chunk blend (the mapping path).
#
# The per-tile fixed-capacity layout above gathers/scatters T*cap instance
# rows per mapping iteration regardless of the real instance count (~2.4x
# waste at VGA: 1.23M rows for ~500k instances, and the gather/scatter pair
# dominated the mapping step at ~40ms). The flat path enumerates only the
# ceil(count/K) LIVE chunks of each tile (binning.chunk_layout, amortized
# per binning episode) and runs the blend with a grid over flat chunks:
# accumulator state persists in scratch across a tile's consecutive chunks,
# the output block revisits the tile row, and dead chunks write to a
# padding tile row that is trimmed on reassembly.
# ---------------------------------------------------------------------------


def _attr_cols(prep: Preprocessed) -> jnp.ndarray:
    """[C+1, N_ATTR] packed attribute table with a zero sentinel row."""
    vf = prep.valid.astype(jnp.float32)
    z = jnp.zeros_like(prep.opacity)
    cols = jnp.stack(
        [
            prep.mean2d[:, 0],
            prep.mean2d[:, 1],
            # conic rows masked by validity: invalid conics can be garbage
            # (det<=0) and the lean fused path has no per-element power gate
            prep.conic[:, 0] * vf,
            prep.conic[:, 1] * vf,
            prep.conic[:, 2] * vf,
            prep.opacity * vf,
            prep.color[:, 0],
            prep.color[:, 1],
            prep.color[:, 2],
            jnp.where(prep.valid, prep.depth, 0.0),
            vf,
            z, z, z, z, z,
        ],
        axis=1,
    )
    return jnp.concatenate([cols, jnp.zeros((1, N_ATTR), jnp.float32)], axis=0)


def flat_pack_grad_aux(cbins_indices: jnp.ndarray, C: int):
    """Per-episode residuals for the sorted-segment pack backward
    (``sorted_pack_grad``): the gaussian id per flat instance slot, the
    permutation sorting slots by gaussian id, and the sorted ids. Built
    ONCE per binning episode (one lax.sort) and reused by every mapping
    iteration's backward, replacing XLA's scatter-add transpose of the
    pack gather — random-index scatter-add is the slowest op class on TPU
    — with a gather + a sorted segment reduction."""
    flat_idx = jnp.where(cbins_indices < 0, C, cbins_indices).reshape(-1)
    perm = jnp.argsort(flat_idx).astype(jnp.int32)
    sorted_ids = flat_idx[perm]
    return flat_idx.astype(jnp.int32), perm, sorted_ids.astype(jnp.int32)


@jax.custom_vjp
def _rows_gather_sorted(cols, flat_idx, perm, sorted_ids):
    """cols[flat_idx] whose transpose is a sorted segment-sum instead of a
    scatter-add (flat_idx/perm/sorted_ids from flat_pack_grad_aux)."""
    return cols[flat_idx]


def _rgs_fwd(cols, flat_idx, perm, sorted_ids):
    return cols[flat_idx], (perm, sorted_ids, cols.shape[0])


def _rgs_bwd(res, g):
    perm, sorted_ids, C1 = res
    gs = g[perm]
    d_cols = jax.ops.segment_sum(
        gs, sorted_ids, num_segments=C1, indices_are_sorted=True
    )
    return d_cols, None, None, None


_rows_gather_sorted.defvjp(_rgs_fwd, _rgs_bwd)


def _pack_instances_flat(prep: Preprocessed, cbins, pack_aux=None) -> jnp.ndarray:
    """Gather instance attributes into the flat [MC, N_ATTR, K] layout.

    ``pack_aux`` (from :func:`flat_pack_grad_aux`) switches the gather's
    VJP to the sorted-segment backward."""
    MC, K = cbins.indices.shape
    C = prep.depth.shape[0]
    cols = _attr_cols(prep)
    if pack_aux is not None:
        flat_idx, perm, sorted_ids = pack_aux
        rows = _rows_gather_sorted(cols, flat_idx, perm, sorted_ids)
        rows = rows.reshape(MC, K, N_ATTR)
    else:
        idx = jnp.where(cbins.indices < 0, C, cbins.indices)
        rows = cols[idx.reshape(-1)].reshape(MC, K, N_ATTR)
    return jnp.swapaxes(rows, 1, 2)


def _flat_fwd_kernel(
    ct_ref, cp_ref, packed_ref, snap_ref, chunk_t_ref,
    acc_ref, pbas_ref, tri_ref, *, dims: _Dims,
):
    """Grouped flat forward: ``dims.group`` chunks per grid step.

    Per-tile blend state persists in scratch across a tile's consecutive
    chunks exactly as before; instead of revisiting a tile-indexed output
    block (which forces one chunk per step — the block index map can only
    name ONE tile per step), every chunk writes a SNAPSHOT of the running
    accumulator, and the XLA caller gathers each tile's final state from
    its last chunk's snapshot. The snapshot writes cost the same HBM
    traffic the old per-step tile-block writes did; the fixed per-grid-step
    overhead (the dominant cost at K=128) is amortized ``group``-fold.
    """
    g = pl.program_id(0)
    px, K, G = dims.px, dims.K, dims.group

    @pl.when(g == 0)
    def _():
        pbas_ref[...] = _pixel_basis(dims, 0).astype(pbas_ref.dtype)
        tri_ref[...] = _tri(K, True, tri_ref.dtype)

    for j in range(G):
        cidx = g * G + j
        t = ct_ref[cidx]
        pos = cp_ref[cidx]
        ox = ((t % dims.tx) * dims.ts_x).astype(jnp.float32)
        oy = ((t // dims.tx) * dims.ts_y).astype(jnp.float32)

        @pl.when(pos == 0)
        def _():
            acc_ref[...] = jnp.zeros((8, px), jnp.float32)
            acc_ref[6, :] = jnp.ones((px,), jnp.float32)

        T = acc_ref[6:7, :]
        done = acc_ref[7:8, :] > 0.5
        chunk_t_ref[j] = jnp.where(done, 0.0, T)

        @pl.when(jnp.sum(acc_ref[7, :]) < px - 0.5)
        def _():
            chunk = packed_ref[j]  # [N_ATTR, K]
            row = lambda r: chunk[r : r + 1, :]
            if dims.exact:
                _b, alpha, _unc, apply, T_pref, w, T_out, done_out = _chunk_common(
                    chunk, tri_ref[...], pbas_ref[...], T, done, ox, oy, dims
                )
                is_med = apply & (T_pref > 0.5)
            else:
                alpha, w, T_pref, T_out = _chunk_fast(
                    chunk, tri_ref[...], pbas_ref[...], T, ox, oy, dims
                )
                done_out = T_out < STOP_T
                # f32 compare: Mosaic rejects cmpf on packed-bf16 vectors
                # (the alpha slab is bf16 under elem16; T_pref is f32).
                is_med = (alpha.astype(jnp.float32) > 0.0) & (T_pref > 0.5)
            ones = jnp.ones((1, K), jnp.float32)
            A6 = jnp.concatenate(
                [row(_R), row(_G), row(_B), row(_Z), ones,
                 jnp.zeros((1, K), jnp.float32)], 0
            ).astype(w.dtype)
            accum = _mm(A6, w)
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, px), 0)
            last = jnp.max(
                jnp.where(is_med, k_iota + 1, 0), axis=0, keepdims=True
            )
            onehot = ((k_iota + 1) == last).astype(jnp.float32)
            z_sel = jax.lax.dot_general(
                row(_Z), onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC,
            )
            acc = acc_ref[0:6, :] + accum
            acc_ref[0:6, :] = jnp.concatenate(
                [acc[0:5, :], jnp.where(last > 0, z_sel, acc[5:6, :])], 0
            )
            acc_ref[6:7, :] = T_out
            acc_ref[7:8, :] = done_out.astype(jnp.float32)

        snap_ref[j, 0:7, :] = acc_ref[0:7, :]
        snap_ref[j, 7:8, :] = jnp.zeros((1, px), jnp.float32)


def _flat_bwd_kernel(
    ct_ref, cp_ref, packed_ref, chunk_t_ref, tfin_ref, gout_ref, grad_ref,
    r_ref, pbas_ref, tri_ref, utri_ref, *, dims: _Dims, mc: int,
):
    """Grouped flat backward: ``dims.group`` chunks per (reversed) grid
    step, processed in descending chunk order within the block. The
    per-tile cotangent / final-T operands arrive pre-gathered to CHUNK
    layout (``gout_c``/``tfin_c`` in the caller) so the block index maps
    stay chunk-major."""
    g = pl.program_id(0)
    px, K, G = dims.px, dims.K, dims.group
    blk = mc // G - 1 - g

    @pl.when(g == 0)
    def _():
        pbas_ref[...] = _pixel_basis(dims, 0).astype(pbas_ref.dtype)
        tri_ref[...] = _tri(K, True, tri_ref.dtype)
        utri_ref[...] = _tri(K, False, utri_ref.dtype)

    for j in range(G - 1, -1, -1):
        rc = blk * G + j
        t = ct_ref[rc]
        ox = ((t % dims.tx) * dims.ts_x).astype(jnp.float32)
        oy = ((t // dims.tx) * dims.ts_y).astype(jnp.float32)

        # Reversed traversal: the first chunk of a tile we encounter is
        # that tile's LAST chunk -> initialize the suffix accumulator from
        # the final transmittance and its cotangent.
        is_new_tile = jnp.where(
            rc == mc - 1, True, ct_ref[jnp.minimum(rc + 1, mc - 1)] != t
        )
        gT = gout_ref[j, 6:7, :]

        @pl.when(is_new_tile)
        def _():
            r_ref[...] = tfin_ref[j] * gT

        G5 = gout_ref[j, 0:5, :]
        T_in = chunk_t_ref[j]  # [1, px]
        grad_ref[j] = jnp.zeros((N_ATTR, K), grad_ref.dtype)

        _flat_chunk_grad(
            packed_ref, grad_ref, r_ref, pbas_ref, tri_ref, utri_ref,
            j, T_in, G5, ox, oy, dims,
        )


def _flat_chunk_grad(
    packed_ref, grad_ref, r_ref, pbas_ref, tri_ref, utri_ref,
    j, T_in, G5, ox, oy, dims: _Dims,
):
    px, K = dims.px, dims.K

    @pl.when(jnp.max(T_in) > 0.0)
    def _():
        done = T_in <= 0.0
        chunk = packed_ref[j]
        if dims.exact:
            _b, alpha, unclamped, apply, T_pref, w, _T_out, _d = _chunk_common(
                chunk, tri_ref[...], pbas_ref[...], T_in, done, ox, oy, dims
            )
            gate = apply
            gate_pow = apply & unclamped
        else:
            alpha, w, T_pref, _T_out = _chunk_fast(
                chunk, tri_ref[...], pbas_ref[...], T_in, ox, oy, dims
            )
            # done pixels carry T_in = 0: their suffix still holds the
            # final-T cotangent, so gate their (never-applied) grads off.
            # Gating compares run in f32 (Mosaic rejects packed-bf16 cmpf);
            # under elem16 the clamp value stored is bf16(0.99) exactly.
            af32 = alpha.astype(jnp.float32)
            clamp_v = BF16_CLAMP if dims.elem16 else 0.99
            gate = (af32 > 0.0) & jnp.logical_not(done)
            gate_pow = gate & (af32 < clamp_v)
        row = lambda r: chunk[r : r + 1, :]
        ones = jnp.ones((1, K), jnp.float32)
        A5 = jnp.concatenate([row(_R), row(_G), row(_B), row(_Z), ones], 0)
        if dims.elem16 and not dims.exact:
            e = jnp.bfloat16
            phi = jax.lax.dot_general(
                A5.astype(e), G5.astype(e), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_DEF,
            )
            wphi = w * phi.astype(e)
            suffix = _mm(utri_ref[...], wphi) + r_ref[...]
            # f32 division (packed-bf16 div unsupported), bf16 product.
            ratio = (af32 / jnp.maximum(1.0 - af32, 1e-6)).astype(e)
            d_power = jnp.where(
                gate_pow, wphi - ratio * suffix.astype(e), e(0)
            )
            Srows = jax.lax.dot_general(
                pbas_ref[...], d_power, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_DEF,
            )
            WGrows = jax.lax.dot_general(
                G5.astype(e), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_DEF,
            )
        else:
            phi = jax.lax.dot_general(
                A5, G5, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC,
            )
            wphi = w * phi
            if dims.bf16:
                suffix = _mm(utri_ref[...], wphi.astype(jnp.bfloat16)) + r_ref[...]
            else:
                suffix = _mm_split2_rev(utri_ref[...], wphi) + r_ref[...]
            # gate_pow subsumes gate, so one where suffices; same algebra as
            # the fused fast kernel: alpha*d_alpha = w*phi -
            # (alpha/(1-alpha))*suffix (w is already apply-gated on the exact
            # path, self-masking on fast).
            ratio = alpha / jnp.maximum(1.0 - alpha, 1e-6)
            d_power = jnp.where(gate_pow, wphi - ratio * suffix, 0.0)
            Srows = _dgT_split2(pbas_ref[...], d_power)
            WGrows = jax.lax.dot_general(
                G5, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC,
            )
        S0 = Srows[0:1, :]
        S1u = Srows[1:2, :]
        S1v = Srows[2:3, :]
        S2uu = Srows[3:4, :]
        S2uv = Srows[4:5, :]
        S2vv = Srows[5:6, :]
        mu = row(_MU) - ox
        mv = row(_MV) - oy
        ca, cb, cc, op = row(_CA), row(_CB), row(_CC), row(_OP)
        E0 = mu * S0 - S1u
        E1 = mv * S0 - S1v
        d_mu = -(ca * E0 + cb * E1)
        d_mv = -(cc * E1 + cb * E0)
        d_ca = -0.5 * (mu * mu * S0 - 2.0 * mu * S1u + S2uu)
        d_cb = -(mu * mv * S0 - mu * S1v - mv * S1u + S2uv)
        d_cc = -0.5 * (mv * mv * S0 - 2.0 * mv * S1v + S2vv)
        d_op = S0 / jnp.maximum(op, 1e-12)
        grad_ref[j] = jnp.concatenate(
            [d_mu, d_mv, d_ca, d_cb, d_cc, d_op, WGrows[0:4, :],
             jnp.zeros((16 - _N_GRAD, K), jnp.float32)],
            axis=0,
        )
        if dims.elem16 and not dims.exact:
            rsum = _mm(jnp.ones((1, K), jnp.bfloat16), wphi)
        else:
            rsum = jnp.sum(wphi, axis=0, keepdims=True)
        r_ref[...] = r_ref[...] + rsum


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _blend_flat(packed, ct, cp, dims: _Dims, interpret: bool):
    out, _, _ = _blend_flat_fwd_impl(packed, ct, cp, dims, interpret)
    return out


def _pad_chunks(packed, ct, cp, dims: _Dims):
    """Pad the chunk axis to a multiple of ``dims.group`` with dead chunks
    (tile = padding tile, pos = 0, zero attributes). Deterministic — the
    VJP backward re-derives the identical padding from the residuals."""
    MC0 = packed.shape[0]
    G = dims.group
    MCp = -(-MC0 // G) * G
    if MCp == MC0:
        return packed, ct, cp, MCp
    pad = MCp - MC0
    packed = jnp.concatenate(
        [packed, jnp.zeros((pad,) + packed.shape[1:], packed.dtype)], 0
    )
    ct = jnp.concatenate([ct, jnp.full((pad,), dims.n_tiles, jnp.int32)], 0)
    cp = jnp.concatenate([cp, jnp.zeros((pad,), jnp.int32)], 0)
    return packed, ct, cp, MCp


def _blend_flat_fwd_impl(packed, ct, cp, dims: _Dims, interpret: bool):
    Tp1 = dims.n_tiles + 1
    G = dims.group
    packed_p, ct_p, cp_p, MCp = _pad_chunks(packed, ct, cp, dims)
    snap, chunk_t = pl.pallas_call(
        functools.partial(_flat_fwd_kernel, dims=dims),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(MCp // G,),
            in_specs=[
                pl.BlockSpec(
                    (G, N_ATTR, dims.K), lambda g, ct, cp: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (G, 8, dims.px), lambda g, ct, cp: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (G, 1, dims.px), lambda g, ct, cp: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((8, dims.px), jnp.float32),
                pltpu.VMEM((8, dims.px), jnp.bfloat16),
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((MCp, 8, dims.px), jnp.float32),
            jax.ShapeDtypeStruct((MCp, 1, dims.px), jnp.float32),
        ],
        interpret=interpret,
    )(ct_p, cp_p, packed_p)
    # Per-tile final state = the snapshot written by the tile's LAST chunk
    # (ct is tile-sorted, so "last" = the chunk whose successor has a
    # different tile). Tiles with no chunks get the empty-blend default.
    cid = jnp.arange(MCp, dtype=jnp.int32)
    nxt = jnp.concatenate([ct_p[1:], jnp.full((1,), -2, jnp.int32)], 0)
    is_last = ct_p != nxt
    last1 = jnp.zeros((Tp1,), jnp.int32).at[ct_p].max(
        jnp.where(is_last, cid + 1, 0)
    )
    default = jnp.zeros((1, 8, dims.px), jnp.float32).at[0, 6, :].set(1.0)
    snap_ext = jnp.concatenate([snap, default], axis=0)
    out = snap_ext[jnp.where(last1 > 0, last1 - 1, MCp)]
    tfin = out[:, 6:7, :]
    return out, chunk_t, tfin


def _blend_flat_vjp_fwd(packed, ct, cp, dims: _Dims, interpret: bool):
    out, chunk_t, tfin = _blend_flat_fwd_impl(packed, ct, cp, dims, interpret)
    return out, (packed, ct, cp, chunk_t, tfin)


def _blend_flat_vjp_bwd(dims: _Dims, interpret: bool, res, g_out):
    packed, ct, cp, chunk_t, tfin = res
    MC0 = packed.shape[0]
    G = dims.group
    packed_p, ct_p, cp_p, MCp = _pad_chunks(packed, ct, cp, dims)
    # Pre-gather the per-tile cotangent / final-T to CHUNK layout so the
    # kernel's block index maps stay chunk-major (multi-chunk blocks can
    # span tiles; a tile-indexed block spec cannot).
    gout_c = g_out[ct_p]
    tfin_c = tfin[ct_p]
    grads = pl.pallas_call(
        functools.partial(_flat_bwd_kernel, dims=dims, mc=MCp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(MCp // G,),
            in_specs=[
                pl.BlockSpec(
                    (G, N_ATTR, dims.K),
                    lambda g, ct, cp: (MCp // G - 1 - g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (G, 1, dims.px),
                    lambda g, ct, cp: (MCp // G - 1 - g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (G, 1, dims.px),
                    lambda g, ct, cp: (MCp // G - 1 - g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (G, 8, dims.px),
                    lambda g, ct, cp: (MCp // G - 1 - g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (G, N_ATTR, dims.K),
                lambda g, ct, cp: (MCp // G - 1 - g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, dims.px), jnp.float32),
                pltpu.VMEM((8, dims.px), jnp.bfloat16),
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((MCp, N_ATTR, dims.K), jnp.float32),
        interpret=interpret,
    )(ct_p, cp_p, packed_p, chunk_t, tfin_c, gout_c)
    return grads[:MC0], None, None


_blend_flat.defvjp(_blend_flat_vjp_fwd, _blend_flat_vjp_bwd)


def render_pallas_flat(
    prep: Preprocessed,
    cbins,
    cam: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray | float = 0.0,
    interpret: bool | None = None,
    pack_aux=None,
) -> RenderOutput:
    """Flat-chunk mapping render: ChunkBins + one gather bounded by the
    real instance count (vs T*cap for the per-tile layout)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dims = _dims_for(cam, cfg, cfg.tile_capacity)
    if not interpret:
        assert dims.K % 128 == 0, "chunk must be a multiple of 128 on TPU"
    packed = _pack_instances_flat(prep, cbins, pack_aux=pack_aux)
    out = _blend_flat(packed, cbins.chunk_tile, cbins.chunk_pos, dims, interpret)
    out = out[: dims.n_tiles]  # trim the dead-chunk padding tile
    ty, tx = tile_grid_shape(cam, cfg)

    def untile(a):
        a = a.reshape(ty, tx, dims.ts_y, dims.ts_x)
        a = jnp.swapaxes(a, 1, 2).reshape(ty * dims.ts_y, tx * dims.ts_x)
        return a[: cam.height, : cam.width]

    Cr = untile(out[:, 0])
    Cg = untile(out[:, 1])
    Cb = untile(out[:, 2])
    D = untile(out[:, 3])
    S = untile(out[:, 4])
    Med = untile(out[:, 5])
    Tf = untile(out[:, 6])
    bg = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (3,))
    return RenderOutput(
        color=jnp.stack([Cr, Cg, Cb], axis=-1) + Tf[..., None] * bg,
        depth=D,
        alpha=S,
        median_depth=jax.lax.stop_gradient(Med),
        final_t=Tf,
        radii=prep.radius,
    )
