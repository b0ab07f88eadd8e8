"""Ablation profile of the fast fused tracking kernel: where do the
per-chunk microseconds go?  Runs a LOCAL copy of the kernel with pieces
toggled off (math becomes wrong — timing only), with a FIXED number of
chunks per tile so every variant executes identical slab counts.

Variants (all at B=4, U=1, K=128, fixed 2 chunks/tile = 2400 chunk-units):
  full        — the production lean math (phase A + B)
  fwd-only    — phase A only (no backward)
  no-exp      — transcendentals (exp/log1p) replaced by cheap mul
  no-mxu      — cumsum/basis matmuls replaced by cheap adds
  min         — both off (loop + load/store + accumulation skeleton)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.pallas_raster import (
    _DEF,
    _MU,
    _MV,
    _CA,
    _CB,
    _CC,
    _OP,
    _R,
    _G,
    _B,
    _Z,
    _N_GRAD,
    _PREC,
    N_ATTR,
    MIN_ALPHA,
    _dg00_split,
    _dgT_split2,
    _dims_for,
    _mm,
    _mm_split2_rev,
    _pack_instances,
    _pixel_basis,
    _tri,
    tile_gt_images,
)
from gsorb_slam_tpu.raster.tiled import render_tiled
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map

FIXED_CHUNKS = 2


def _kernel(counts_ref, packed_ref, gt_ref, grad_ref, loss_ref,
            alpha_scr, tpref_scr, acc_ref, pbas_ref, tri_ref, utri_ref,
            *, dims, B, do_exp, do_mxu, do_bwd, mxu_fast=False,
            elem_bf16=False):
    # elem_bf16: run the [K, px] ELEMENTWISE slab chain in bfloat16 (math
    # becomes approximate — timing only). bf16 packs 2 values per lane
    # slot; if Mosaic issues packed bf16 VPU ops this should approach 2x on
    # the pass-dominated cost. Accumulators/scratch stay f32.
    edt = jnp.bfloat16 if elem_bf16 else jnp.float32
    pid = pl.program_id(0)
    px, K = dims.px, dims.K

    @pl.when(pid == 0)
    def _():
        pbas_ref[...] = _pixel_basis(dims, 0).astype(pbas_ref.dtype)
        tri_ref[...] = _tri(K, True, tri_ref.dtype)
        utri_ref[...] = _tri(K, False, utri_ref.dtype)

    grad_ref[...] = jnp.zeros(grad_ref.shape, grad_ref.dtype)

    for b in range(B):
        t = pid * B + b
        ox = ((t % dims.tx) * dims.ts_x).astype(jnp.float32)
        oy = ((t // dims.tx) * dims.ts_y).astype(jnp.float32)
        acc_ref[...] = jnp.zeros((8, px), jnp.float32)
        acc_ref[6, :] = jnp.ones((px,), jnp.float32)

        def body(c, _):
            T = acc_ref[6:7, :]
            chunk = packed_ref[b, :, pl.ds(c * K, K)]
            row = lambda r: chunk[r : r + 1, :]
            mu = row(_MU) - ox
            mv = row(_MV) - oy
            ca, cb, cc = row(_CA), row(_CB), row(_CC)
            op = row(_OP)
            z = row(_Z)
            ln_op = jnp.log(jnp.maximum(op, 1e-12)) if do_exp else op
            g0 = -0.5 * (ca * mu * mu + cc * mv * mv) - cb * mu * mv + ln_op
            g1 = ca * mu + cb * mv
            g2 = cc * mv + cb * mu
            grows = jnp.concatenate(
                [g0, g1, g2, -0.5 * ca, -cb, -0.5 * cc,
                 jnp.zeros((2, K), jnp.float32)], 0)
            if do_mxu:
                if mxu_fast:
                    ln_alpha = jax.lax.dot_general(grows.astype(jnp.bfloat16), pbas_ref[...], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_DEF)
                else:
                    ln_alpha = _dg00_split(grows, pbas_ref[...])
            else:
                ln_alpha = jnp.zeros((K, px), jnp.float32) + jnp.sum(g0) * 1e-6 - 1.0
            # Mirrors the production elem16 structure (pallas_raster.
            # _chunk_fast): transcendentals, compares, and the log-domain
            # chain stay f32 (Mosaic rejects cmpf/div/exp on packed bf16);
            # the bf16 savings are the slab casts, stores, and MXU passes.
            raw = jnp.exp(ln_alpha) if do_exp else ln_alpha * 0.05
            alpha_f = jnp.where(
                raw >= MIN_ALPHA, jnp.minimum(raw, 0.99), 0.0
            )
            s = jnp.log1p(-alpha_f) if do_exp else -alpha_f
            if do_mxu:
                cum_excl = _mm(tri_ref[...], s.astype(jnp.bfloat16)) if (mxu_fast or elem_bf16) else _mm_split2_rev(tri_ref[...], s)
            else:
                cum_excl = s * 0.5
            T_pref_f = T * (
                jnp.exp(cum_excl) if do_exp else (1.0 + cum_excl)
            )
            alpha = alpha_f.astype(edt)
            T_pref = T_pref_f.astype(edt)
            w = (alpha_f * T_pref_f).astype(edt)
            one_minus = 1.0 - alpha_f
            T_out = T_pref_f[K - 1 : K, :] * one_minus[K - 1 : K, :]
            alpha_scr[pl.ds(c * K, K), :] = alpha_f
            tpref_scr[pl.ds(c * K, K), :] = T_pref_f
            ones = jnp.ones((1, K), jnp.float32)
            A5 = jnp.concatenate([row(_R), row(_G), row(_B), z, ones], 0)
            accum = (_mm(A5.astype(jnp.bfloat16), w.astype(jnp.bfloat16)) if (mxu_fast or elem_bf16) else _mm(A5, w)) if do_mxu else jnp.zeros((5, px), jnp.float32) + T.astype(jnp.float32) * 0.9
            cross = ((T_pref_f > 0.5) & (T_pref_f * one_minus <= 0.5)).astype(jnp.float32)
            z_sel = _mm(z, cross) if do_mxu else jnp.sum(cross, 0, keepdims=True)
            acc_ref[0:5, :] = acc_ref[0:5, :] + accum
            acc_ref[5:6, :] = acc_ref[5:6, :] + z_sel
            acc_ref[6:7, :] = T_out
            return 0

        jax.lax.fori_loop(0, FIXED_CHUNKS, body, 0)

        Cr, Cg, Cb = acc_ref[0:1, :], acc_ref[1:2, :], acc_ref[2:3, :]
        D = acc_ref[3:4, :]
        S = acc_ref[4:5, :]
        gtr, gtg, gtb = gt_ref[b, 0:1, :], gt_ref[b, 1:2, :], gt_ref[b, 2:3, :]
        gtd = gt_ref[b, 3:4, :]
        mask = ((S > 0.99) & (gtd > 0.0)).astype(jnp.float32)
        dr, dg, db = Cr - gtr, Cg - gtg, Cb - gtb
        loss_color = jnp.sum((jnp.abs(dr) + jnp.abs(dg) + jnp.abs(db)) * mask)
        loss_depth = jnp.sum(jnp.abs(acc_ref[5:6, :] - gtd) * mask)
        gcoef = mask
        G5 = jnp.concatenate(
            [gcoef * jnp.sign(dr), gcoef * jnp.sign(dg), gcoef * jnp.sign(db),
             gcoef * jnp.sign(D - gtd), jnp.zeros((1, px), jnp.float32)], 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
        loss_ref[b, :, :] = jnp.where(
            lane == 0, loss_color, jnp.where(lane == 1, loss_depth, 0.0))

        if not do_bwd:
            continue

        acc_ref[7, :] = jnp.zeros((px,), jnp.float32)

        def chunk_grad(c, R):
            alpha_f = alpha_scr[pl.ds(c * K, K), :]  # f32 scratch
            tpref_f = tpref_scr[pl.ds(c * K, K), :]
            alpha_a = alpha_f.astype(edt)
            w = (alpha_f * tpref_f).astype(edt)
            chunk = packed_ref[b, :, pl.ds(c * K, K)]
            row = lambda r: chunk[r : r + 1, :]
            ones = jnp.ones((1, K), jnp.float32)
            A5 = jnp.concatenate([row(_R), row(_G), row(_B), row(_Z), ones], 0)
            if do_mxu:
                if mxu_fast or elem_bf16:
                    phi = jax.lax.dot_general(A5.astype(jnp.bfloat16), G5.astype(jnp.bfloat16), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_DEF)
                else:
                    phi = jax.lax.dot_general(
                        A5, G5, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_PREC)
            else:
                phi = w * edt(0.5) + edt(0.25)
            phi = phi.astype(edt)
            wphi = w * phi
            if do_mxu:
                suffix = (_mm(utri_ref[...], wphi.astype(jnp.bfloat16)) if (mxu_fast or elem_bf16) else _mm_split2_rev(utri_ref[...], wphi.astype(jnp.float32))) + R
            else:
                suffix = wphi.astype(jnp.float32) + R
            # gates + ratio in f32 (packed-bf16 cmpf/div unsupported);
            # d_power = w*phi - (a/(1-a))*suffix, the production algebra.
            ratio = (alpha_f / jnp.maximum(1.0 - alpha_f, 1e-6)).astype(edt)
            live = (alpha_f > 0.0) & (alpha_f < 0.99)
            d_power = jnp.where(
                live, wphi - ratio * suffix.astype(edt), edt(0.0)
            )
            if do_mxu:
                Srows = (jax.lax.dot_general(pbas_ref[...], d_power.astype(jnp.bfloat16), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_DEF) if (mxu_fast or elem_bf16) else _dgT_split2(pbas_ref[...], d_power))
                if mxu_fast or elem_bf16:
                    WGrows = jax.lax.dot_general(
                        G5.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_DEF)
                else:
                    WGrows = jax.lax.dot_general(
                        G5, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_PREC)
            else:
                Srows = jnp.zeros((8, K), jnp.float32) + jnp.sum(d_power.astype(jnp.float32)) * 1e-6 + chunk[0:1, :]
                WGrows = jnp.zeros((5, K), jnp.float32) + chunk[0:1, :]
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
                 jnp.zeros((16 - _N_GRAD, K), jnp.float32)], axis=0)
            grad_ref[b, :, pl.ds(c * K, K)] = G16
            return R + jnp.sum(wphi, axis=0, keepdims=True)

        def bwd_body(i, _):
            c = (FIXED_CHUNKS - 1) - i
            acc_ref[7:8, :] = chunk_grad(c, acc_ref[7:8, :])
            return 0

        jax.lax.fori_loop(0, FIXED_CHUNKS, bwd_body, 0)


def run_variant(name, packed, counts, gt4, cam, cfg, do_exp, do_mxu, do_bwd,
                B=4, mxu_fast=False, elem_bf16=False):
    cap = packed.shape[2]
    dims = _dims_for(cam, cfg, cap)
    T = dims.n_tiles
    Tp = ((T + B - 1) // B) * B
    if Tp != T:
        packed = jnp.pad(packed, ((0, Tp - T), (0, 0), (0, 0)))
        gt4 = jnp.pad(gt4, ((0, Tp - T), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, Tp - T))

    def call(p):
        grads, loss = pl.pallas_call(
            functools.partial(_kernel, dims=dims, B=B, do_exp=do_exp,
                              do_mxu=do_mxu, do_bwd=do_bwd, mxu_fast=mxu_fast,
                              elem_bf16=elem_bf16),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Tp // B,),
                in_specs=[
                    pl.BlockSpec((B, N_ATTR, cap), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, 8, dims.px), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((B, N_ATTR, cap), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, 1, dims.px), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((cap, dims.px), jnp.float32),
                    pltpu.VMEM((cap, dims.px), jnp.float32),
                    pltpu.VMEM((8, dims.px), jnp.float32),
                    pltpu.VMEM((8, dims.px), jnp.bfloat16),
                    pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                    pltpu.VMEM((dims.K, dims.K), jnp.bfloat16),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((Tp, N_ATTR, cap), jnp.float32),
                jax.ShapeDtypeStruct((Tp, 1, dims.px), jnp.float32),
            ],
            interpret=bool(int(__import__("os").environ.get(
                "ABLATE_INTERPRET", "0"))),
        )(counts, p, gt4)
        return grads

    R = 10

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(p, n):
        def step(i, c):
            g = call(c)
            eps = jnp.sum(g[0, 0, :1]) * 0
            return c + eps
        return jax.lax.fori_loop(0, n, step, p)

    jax.block_until_ready(loop(packed, R))
    jax.block_until_ready(loop(packed, 0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(packed, R))
        full = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(packed, 0))
        zero = time.perf_counter() - t0
        best = min(best, (full - zero) / R)
    n_units = Tp * FIXED_CHUNKS
    print(f"{name:30s} {best*1e3:8.3f} ms  ({best/n_units*1e6:6.3f} us/chunk-unit)",
          flush=True)
    return best


def main():
    W, H, N, CAP = 640, 480, 250_000, 1 << 18
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(0.8, 4.0, N)], -1).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(gm, jnp.asarray(means),
                    jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
                    jnp.asarray(means[:, 2]), jnp.ones(N, bool), cam.fx, cam.fy)
    T_cw = jnp.eye(4)
    import os

    K_env = int(os.environ.get("CHUNK", "128"))
    B_env = int(os.environ.get("B", "4"))
    cfg = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, dilate_px=2.0,
                       exact_stop=False, chunk=K_env, chunk_unroll=1,
                       fused_tiles_per_step=B_env)
    prep = jax.jit(lambda: preprocess(gm.means, gm.rgb, gm.quats,
                                      gm.logit_opacities, gm.log_scales,
                                      gm.active, T_cw, cam))()
    bins = jax.jit(lambda: bin_gaussians(prep, cam, cfg))()
    jax.block_until_ready(bins.indices)
    packed = jax.jit(lambda: _pack_instances(prep, bins))()
    out0 = jax.jit(lambda p: render_tiled(p, bins, cam, cfg))(prep)
    gt_c = jax.lax.stop_gradient(out0.color)
    gt_d = jax.lax.stop_gradient(jnp.where(out0.alpha > 0.5, out0.median_depth, 0.0))
    gt4 = tile_gt_images(gt_c, gt_d, cam, cfg)
    print(f"fixed {FIXED_CHUNKS} chunks/tile, 1200 tiles", flush=True)

    import os

    sel = os.environ.get("ABLATE", "all")
    V = {
        "full": ("full (A+B)", True, True, True, False, False),
        "bf16": ("mxu-bf16 (A+B)", True, True, True, True, False),
        "elem16": ("elem-bf16 (A+B)", True, True, True, False, True),
        "fwd": ("fwd-only", True, True, False, False, False),
        "noexp": ("no-exp (A+B)", False, True, True, False, False),
        "nomxu": ("no-mxu (A+B)", True, False, True, False, False),
        "min": ("min (A+B)", False, False, True, False, False),
    }
    names = list(V) if sel == "all" else sel.split(",")
    for nm in names:
        label, de, dm, db, mf, eb = V[nm]
        try:
            run_variant(label, packed, bins.counts, gt4, cam, cfg, de, dm, db,
                        mxu_fast=mf, elem_bf16=eb)
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " ")[:300]
            print(f"{label:30s} CRASH: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
