"""Paired-rect fused tracking kernel: two vertically-adjacent 16x8 tiles
packed into ONE 256-lane slab.

Why. The fused tracking kernel's cost is the [K, px] slab elementwise
passes (PLAN.md speed-of-light table); for the 1-3 px splats SLAM maps
produce, a half-height tile (16x8, px=128) cuts per-instance element work
~2x while raising duplication only ~1.25x. But Mosaic mis-lowers the fused
loss block at px=128 (the rect16x8 compiled divergence — interpret exact,
compiled bit-identically wrong), so instead of fighting the lowering we
keep every Mosaic shape at the proven px=256 by packing the TWO halves of
the old square tile side by side in the lane axis:

- lanes 0..127 carry tile A's (16x8) pixels, lanes 128..255 tile B's;
- each lane half blends its OWN tile's depth-sorted instances: slab row k
  is instance k of tile A on the left lanes and instance k of tile B on
  the right ones. Vertically-adjacent tiles have correlated instance
  counts (they are the two halves of the old square tile), so the pair's
  chunk trip count max(cA, cB) stays well below the square tile's count;
- the quadratic falloff matmul becomes block-diagonal: a [16, K] coeff
  bundle (rows 0-7 = tile A's g0..g5, rows 8-15 = tile B's) against a
  [16, 256] basis whose top rows are masked to the left lanes and bottom
  rows to the right — ONE MXU pass yields both halves' ln(alpha);
- the whole per-lane chain (exp/gates, triangular-cumsum matmul,
  transmittance carry, crossing median) is untouched — shared with the
  square kernel via ``_fast_post``;
- accumulation carries both halves' color rows (A9 = rA gA bA zA | rB gB
  bB zB | ones) and lane-selects per channel ONCE per pair at the end;
- the backward masks the cotangent rows per lane half (G5 -> G10), reads
  per-half moments from the block-diagonal basis (Srows rows 0-5 / 8-13),
  and runs the row-space gradient algebra per half.

Net effect: element work per instance-pixel halves at unchanged Mosaic
shapes. Equivalent of the same CUDA kernels as the square path
(``forward.cu:261-401``, ``backward.cu:399-556``); semantics = the fast
(non-exact) square kernel over a 16x8 tiling. The exact-stop mode is not
offered here (tracking production runs fast semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster.binning import tile_grid_shape
from gsorb_slam_tpu.raster.pallas_raster import (
    BF16_CLAMP,
    N_ATTR,
    STOP_T,
    _B,
    _CA,
    _CB,
    _CC,
    _Dims,
    _dg00_split,
    _dgT_split2,
    _fast_post,
    _G,
    _grows,
    _mm,
    _mm_split2_rev,
    _MU,
    _MV,
    _OP,
    _R,
    _tri,
    _Z,
    _N_GRAD,
    tile_gt_images,
)
from gsorb_slam_tpu.raster.types import RasterConfig

_PREC = jax.lax.Precision.HIGHEST
_DEF = jax.lax.Precision.DEFAULT


def pair_permutation(ty: int, tx: int) -> np.ndarray:
    """[ty*tx] row-major rect-tile ids in PAIR-MAJOR order: slot 2p is the
    upper half of pair p, slot 2p+1 the lower half; pair p covers the old
    square tile (p // tx * 16 rows, p % tx * 16 cols)."""
    assert ty % 2 == 0, f"paired tiling needs an even rect-tile row count (got {ty})"
    p = np.arange(ty // 2 * tx)
    py, pxc = p // tx, p % tx
    a = (2 * py) * tx + pxc
    b = (2 * py + 1) * tx + pxc
    return np.stack([a, b], 1).reshape(-1).astype(np.int32)


def count_sorted_pair_permutation(counts: jnp.ndarray) -> jnp.ndarray:
    """[Tr] rect-tile ids in DESCENDING-count order. Pairing rank 2i with
    2i+1 after a count sort minimizes sum(max(cA, cB)) over all pairings
    (exchange argument: any pairing that splits two sort-adjacent tiles
    can be improved by swapping), so per-pair chunk trips — the paired
    kernel's work unit — are minimal, and empty tiles pair with empty
    tiles instead of padding a live partner's chunks. Traced (the
    permutation depends on the binning episode's counts); the kernel takes
    it through the ``tile_ids`` scalar-prefetch operand."""
    return jnp.argsort(-counts.astype(jnp.int32), stable=True).astype(jnp.int32)


def pack_gt_pairs(
    gt_color: jnp.ndarray, gt_depth: jnp.ndarray, cam: Camera,
    cfg: RasterConfig, perm: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[T_pair, 8, 2*rect_px] gt tiles in the paired lane layout (left lane
    half = the pair's FIRST rect tile). ``perm`` selects the pairing (rows
    2p / 2p+1 = pair p's halves); defaults to the static vertical-neighbor
    pairing of :func:`pair_permutation`."""
    gt4 = tile_gt_images(gt_color, gt_depth, cam, cfg)  # [Tr, 8, rect_px]
    ty, tx = tile_grid_shape(cam, cfg)
    if perm is None:
        perm = jnp.asarray(pair_permutation(ty, tx))
    g = gt4[perm]
    tp = (ty * tx) // 2
    rp = cfg.tile_w_px * cfg.tile_h_px
    return jnp.swapaxes(g.reshape(tp, 2, 8, rp), 1, 2).reshape(tp, 8, 2 * rp)


def _pixel_basis_paired(dims: _Dims) -> jnp.ndarray:
    """[16, px] block-diagonal rect-local polynomial basis: rows 0-7 carry
    (1, pu, pv, pu^2, pu*pv, pv^2, 0, 0) masked to the left lane half, rows
    8-15 the same masked to the right half. Entries are integers <= 225 —
    exact in bf16 (see ``_dg00_split``)."""
    px, tsx = dims.px, dims.ts_x
    hpx = px // 2
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    loc = pix % hpx
    pu = (loc % tsx).astype(jnp.float32)
    pv = (loc // tsx).astype(jnp.float32)
    one = jnp.ones((1, px), jnp.float32)
    zero = jnp.zeros((1, px), jnp.float32)
    rows = jnp.concatenate(
        [one, pu, pv, pu * pu, pu * pv, pv * pv, zero, zero], 0
    )  # [8, px]
    m_a = (pix < hpx).astype(jnp.float32)
    return jnp.concatenate([rows * m_a, rows * (1.0 - m_a)], 0)


def _half_grads(chunk, ox, oy, S6, WG4, K):
    """Per-half row-space gradient algebra (identical to the square
    kernel's): S6 = [6, K] basis moments, WG4 = [4, K] w-weighted cotangent
    sums -> [16, K] packed-layout instance gradients."""
    row = lambda r: chunk[r : r + 1, :]
    S0 = S6[0:1, :]
    S1u = S6[1:2, :]
    S1v = S6[2:3, :]
    S2uu = S6[3:4, :]
    S2uv = S6[4:5, :]
    S2vv = S6[5:6, :]
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
    return jnp.concatenate(
        [d_mu, d_mv, d_ca, d_cb, d_cc, d_op, WG4,
         jnp.zeros((16 - _N_GRAD, K), jnp.float32)],
        axis=0,
    )


def _paired_track_kernel(
    counts_ref, tids_ref, packed_ref, gt_ref, grad_ref, loss_ref,
    alpha_scr, w_scr, acc_ref, pbas_ref, tri_ref, utri_ref, st_ref,
    *, dims: _Dims, im_w: float, depth_w: float, use_sur: bool, B: int,
):
    """Fused paired-rect tracking iteration, B tile-PAIRS per grid step.

    acc_ref rows: 0-3 = tile A's (Cr,Cg,Cb,D) accumulators (left lanes
    valid), 4-7 = tile B's (right lanes valid), 8 = S (both halves),
    9/10 = crossing-median z per half, 11 = transmittance carry,
    12 = phase-B suffix accumulator R.
    """
    pid = pl.program_id(0)
    px, K, U = dims.px, dims.K, dims.unroll
    hpx = px // 2

    @pl.when(pid == 0)
    def _():
        pbas_ref[...] = _pixel_basis_paired(dims).astype(pbas_ref.dtype)
        tri_ref[...] = _tri(K, True, tri_ref.dtype)
        utri_ref[...] = _tri(K, False, utri_ref.dtype)

    grad_ref[...] = jnp.zeros(grad_ref.shape, grad_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    laneA = lane < hpx
    mAf = laneA.astype(jnp.float32)

    for b in range(B):
        pair = pid * B + b
        cA = counts_ref[2 * pair]
        cB = counts_ref[2 * pair + 1]
        count = jnp.maximum(cA, cB)
        tgA = tids_ref[2 * pair]
        tgB = tids_ref[2 * pair + 1]
        oxA = ((tgA % dims.tx) * dims.ts_x).astype(jnp.float32)
        oyA = ((tgA // dims.tx) * dims.ts_y).astype(jnp.float32)
        oxB = ((tgB % dims.tx) * dims.ts_x).astype(jnp.float32)
        oyB = ((tgB // dims.tx) * dims.ts_y).astype(jnp.float32)

        acc_ref[...] = jnp.zeros((16, px), jnp.float32)
        acc_ref[11, :] = jnp.ones((px,), jnp.float32)
        st_ref[0] = 0
        st_ref[1] = 0

        n_chunks_live = jnp.minimum(
            (count + K - 1) // K, dims.n_chunks
        ).astype(jnp.int32)
        n_super = (n_chunks_live + U - 1) // U

        # ---- phase A ----
        def do_chunk(c):
            T = acc_ref[11:12, :]
            chA = packed_ref[2 * b, :, pl.ds(c * K, K)]
            chB = packed_ref[2 * b + 1, :, pl.ds(c * K, K)]
            grows16 = jnp.concatenate(
                [_grows(chA, oxA, oyA), _grows(chB, oxB, oyB)], 0
            )  # [16, K]
            ln_alpha = _dg00_split(grows16, pbas_ref[...])  # [K, px]
            alpha, w, T_pref, T_out = _fast_post(
                ln_alpha, tri_ref[...], T, dims
            )
            alpha_scr[pl.ds(c * K, K), :] = alpha
            w_scr[pl.ds(c * K, K), :] = w
            edt = jnp.bfloat16 if dims.elem16 else jnp.float32
            rowA = lambda r: chA[r : r + 1, :]
            rowB = lambda r: chB[r : r + 1, :]
            ones = jnp.ones((1, K), jnp.float32)
            A9 = jnp.concatenate(
                [rowA(_R), rowA(_G), rowA(_B), rowA(_Z),
                 rowB(_R), rowB(_G), rowB(_B), rowB(_Z), ones], 0
            ).astype(edt)
            accum = _mm(A9, w)  # [9, px] f32 (MXU accumulation)
            cross = ((T_pref > 0.5) & (T_pref - w <= 0.5)).astype(edt)
            z2 = jnp.concatenate([rowA(_Z), rowB(_Z)], 0).astype(edt)
            z_sel = _mm(z2, cross)  # [2, px]
            acc_ref[0:9, :] = acc_ref[0:9, :] + accum
            acc_ref[9:11, :] = acc_ref[9:11, :] + z_sel
            acc_ref[11:12, :] = T_out
            st_ref[0] = (c + 1).astype(jnp.int32)
            st_ref[1] = (jnp.max(T_out) < STOP_T).astype(jnp.int32)

        def body(sc, _):
            for j in range(U):
                c = sc * U + j

                @pl.when((c < n_chunks_live) & (st_ref[1] == 0))
                def _():
                    do_chunk(c)

            return 0

        jax.lax.fori_loop(0, n_super, body, 0)
        sc_end = st_ref[0]

        # ---- cotangents + loss (lane-select the per-half accumulators) ----
        Cr = jnp.where(laneA, acc_ref[0:1, :], acc_ref[4:5, :])
        Cg = jnp.where(laneA, acc_ref[1:2, :], acc_ref[5:6, :])
        Cb = jnp.where(laneA, acc_ref[2:3, :], acc_ref[6:7, :])
        D = jnp.where(laneA, acc_ref[3:4, :], acc_ref[7:8, :])
        S = acc_ref[8:9, :]
        Med = jnp.where(laneA, acc_ref[9:10, :], acc_ref[10:11, :])
        gtr, gtg, gtb = gt_ref[b, 0:1, :], gt_ref[b, 1:2, :], gt_ref[b, 2:3, :]
        gtd = gt_ref[b, 3:4, :]
        mask = ((S > 0.99) & (gtd > 0.0)).astype(jnp.float32)
        dr, dg, db = Cr - gtr, Cg - gtg, Cb - gtb
        loss_color = jnp.sum((jnp.abs(dr) + jnp.abs(dg) + jnp.abs(db)) * mask)
        depth_pred = Med if use_sur else D
        loss_depth = jnp.sum(jnp.abs(depth_pred - gtd) * mask)
        gcoef = im_w * mask
        dcoef = (0.0 if use_sur else depth_w) * mask
        G5core = jnp.concatenate(
            [
                gcoef * jnp.sign(dr),
                gcoef * jnp.sign(dg),
                gcoef * jnp.sign(db),
                dcoef * jnp.sign(D - gtd),
                jnp.zeros((1, px), jnp.float32),
            ],
            0,
        )  # [5, px] per-lane cotangents
        loss_ref[b, :, :] = jnp.where(
            lane == 0, im_w * loss_color,
            jnp.where(lane == 1, depth_w * loss_depth, 0.0),
        )

        # rows 0-4 masked to tile A's lanes, rows 5-9 to tile B's: phi and
        # the w-weighted reductions then split per half automatically.
        G10 = jnp.concatenate([G5core * mAf, G5core * (1.0 - mAf)], 0)

        # ---- phase B ----
        acc_ref[12, :] = jnp.zeros((px,), jnp.float32)  # suffix R

        def chunk_grad(c):
            R = acc_ref[12:13, :]
            alpha_a = alpha_scr[pl.ds(c * K, K), :]
            w = w_scr[pl.ds(c * K, K), :]
            chA = packed_ref[2 * b, :, pl.ds(c * K, K)]
            chB = packed_ref[2 * b + 1, :, pl.ds(c * K, K)]
            rowA = lambda r: chA[r : r + 1, :]
            rowB = lambda r: chB[r : r + 1, :]
            ones = jnp.ones((1, K), jnp.float32)
            A10 = jnp.concatenate(
                [rowA(_R), rowA(_G), rowA(_B), rowA(_Z), ones,
                 rowB(_R), rowB(_G), rowB(_B), rowB(_Z), ones], 0
            )  # [10, K]
            if dims.elem16:
                e = jnp.bfloat16
                phi = jax.lax.dot_general(
                    A10.astype(e), G10.astype(e), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )  # [K, px] f32
                wphi = w * phi.astype(e)
                suffix = _mm(utri_ref[...], wphi) + R
                # Mosaic (v5e) rejects cmpf/div on packed bf16: mask+ratio
                # run on ONE f32 upcast; clamped alphas store bf16(0.99).
                af = alpha_a.astype(jnp.float32)
                ratio = (af / (1.0 - af)).astype(e)
                d_power = jnp.where(
                    af < BF16_CLAMP, wphi - ratio * suffix.astype(e), e(0)
                )
                Srows = jax.lax.dot_general(
                    pbas_ref[...], d_power, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )  # [16, K]
                WG = jax.lax.dot_general(
                    G10.astype(e), w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_DEF,
                )  # [10, K]
            else:
                phi = jax.lax.dot_general(
                    A10, G10, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC,
                )
                wphi = w * phi
                if dims.bf16:
                    suffix = _mm(utri_ref[...], wphi.astype(jnp.bfloat16)) + R
                else:
                    suffix = _mm_split2_rev(utri_ref[...], wphi) + R
                ratio = alpha_a / (1.0 - alpha_a)
                d_power = jnp.where(alpha_a < 0.99, wphi - ratio * suffix, 0.0)
                Srows = _dgT_split2(pbas_ref[...], d_power)
                WG = jax.lax.dot_general(
                    G10, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC,
                )
            grad_ref[2 * b, :, pl.ds(c * K, K)] = _half_grads(
                chA, oxA, oyA, Srows[0:6, :], WG[0:4, :], K
            )
            grad_ref[2 * b + 1, :, pl.ds(c * K, K)] = _half_grads(
                chB, oxB, oyB, Srows[8:14, :], WG[5:9, :], K
            )
            if dims.elem16:
                rsum = _mm(jnp.ones((1, K), jnp.bfloat16), wphi)
            else:
                rsum = jnp.sum(wphi, axis=0, keepdims=True)
            acc_ref[12:13, :] = R + rsum

        def bwd_body(i, _):
            for j in range(U):
                c = (sc_end - 1) - (i * U + j)

                @pl.when(c >= 0)
                def _():
                    chunk_grad(c)

            return 0

        jax.lax.fori_loop(0, n_super, bwd_body, 0)


def _dims_paired(cam: Camera, cfg: RasterConfig, cap: int) -> _Dims:
    assert not cfg.exact_stop, "paired kernel implements fast semantics only"
    ty, tx = tile_grid_shape(cam, cfg)
    rect_px = cfg.tile_w_px * cfg.tile_h_px
    K = min(cfg.chunk, cap)
    assert cap % K == 0 and (K & (K - 1)) == 0, "chunk must be power of two"
    return _Dims(
        ts_x=cfg.tile_w_px,
        ts_y=cfg.tile_h_px,
        px=2 * rect_px,
        cap=cap,
        K=K,
        n_chunks=cap // K,
        tx=tx,
        n_tiles=ty * tx,
        exact=False,
        bf16=getattr(cfg, "blend_bf16", False),
        elem16=getattr(cfg, "elem_bf16", False),
        unroll=min(getattr(cfg, "chunk_unroll", 4), cap // K),
        group=1,
    )


def tracking_loss_grad_paired(
    packed: jnp.ndarray,  # [Tr, N_ATTR, cap] screen instances, PAIR-MAJOR
    counts: jnp.ndarray,  # [Tr] per rect tile, pair-major
    gt_pairs: jnp.ndarray,  # [Tp, 8, 2*rect_px] (pack_gt_pairs)
    cam: Camera,
    cfg: RasterConfig,
    im_weight: float,
    depth_weight: float,
    use_sur_depth: bool,
    interpret: bool | None = None,
    tile_ids: jnp.ndarray | None = None,  # [Tr] row-major rect tile ids
) -> tuple[jnp.ndarray, ...]:
    """One fused paired-rect launch -> (image_l1*im_w, depth_l1*depth_w,
    d_packed). Same contract as ``tracking_loss_grad`` over a 16x8 rect
    tiling whose rows were permuted to pair-major order (rows 2p / 2p+1 =
    the upper / lower halves of square tile p — ``pair_permutation``).
    ``tile_ids`` defaults to that permutation (i.e. rows are assumed
    pair-major over the full grid)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cap = packed.shape[2]
    dims = _dims_paired(cam, cfg, cap)
    if not interpret:
        assert dims.K % 128 == 0, "chunk must be a multiple of 128 on TPU"
    Tr = packed.shape[0]
    assert Tr % 2 == 0
    Tp = Tr // 2
    if tile_ids is None:
        ty, tx = tile_grid_shape(cam, cfg)
        tile_ids = jnp.asarray(pair_permutation(ty, tx))
    tile_ids = tile_ids.astype(jnp.int32)

    B = max(1, int(getattr(cfg, "fused_tiles_per_step", 1)))
    Tpp = ((Tp + B - 1) // B) * B
    if Tpp != Tp:
        packed = jnp.pad(packed, ((0, 2 * (Tpp - Tp)), (0, 0), (0, 0)))
        gt_pairs = jnp.pad(gt_pairs, ((0, Tpp - Tp), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, 2 * (Tpp - Tp)))
        tile_ids = jnp.pad(tile_ids, (0, 2 * (Tpp - Tp)))
    edt = jnp.bfloat16 if dims.elem16 else jnp.float32
    grads, loss = pl.pallas_call(
        functools.partial(
            _paired_track_kernel, dims=dims, im_w=float(im_weight),
            depth_w=float(depth_weight), use_sur=bool(use_sur_depth), B=B,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tpp // B,),
            in_specs=[
                pl.BlockSpec(
                    (2 * B, N_ATTR, cap), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (B, 8, dims.px), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (2 * B, N_ATTR, cap), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (B, 1, dims.px), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((cap, dims.px), edt),  # applied alpha
                pltpu.VMEM((cap, dims.px), edt),  # w = alpha * T_pref
                pltpu.VMEM((16, dims.px), jnp.float32),  # accumulators
                pltpu.VMEM((16, dims.px), jnp.bfloat16),  # paired basis
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                pltpu.SMEM((2,), jnp.int32),  # [c_end, saturated]
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((2 * Tpp, N_ATTR, cap), jnp.float32),
            jax.ShapeDtypeStruct((Tpp, 1, dims.px), jnp.float32),
        ],
        interpret=interpret,
    )(counts, tile_ids, packed, gt_pairs)
    image_l1 = jnp.sum(loss[:, 0, 0])
    depth_l1 = jnp.sum(loss[:, 0, 1])
    return image_l1, depth_l1, grads[:Tr]
