"""Instance-space rendering: the zero-gather-per-iteration tracking path.

Motivation (measured on v5e): XLA gather/scatter costs ~30ns per index
regardless of row width, so ANY per-iteration movement of ~1M instances
between Gaussian space and tile-instance space costs ~35ms — dwarfing the
blend kernel. Tracking runs ~200 iterations against FIXED bins, so:

1. ``pack_raw_instances`` gathers RAW Gaussian parameters (means/rgb/quat/
   scale/opacity) into the [T, rows, cap] tile-instance layout ONCE per
   frame (amortized with the bins themselves),
2. ``preprocess_instances`` does the EWA projection per INSTANCE as pure
   elementwise XLA math (≈3.5x redundant flops vs per-Gaussian — microseconds),
   fully differentiable w.r.t. the pose,
3. the Pallas blend consumes the result directly.

The pose gradient then flows through elementwise ops + reductions only — no
gather/scatter anywhere in the 200-iteration loop. (Mapping still needs the
per-Gaussian scatter since it optimizes the splats themselves.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.transforms import quat_to_rotmat
from gsorb_slam_tpu.raster.binning import TileBins
from gsorb_slam_tpu.raster.preprocess import LOW_PASS, NEAR_CULL
from gsorb_slam_tpu.raster.types import RasterConfig, RenderOutput

N_RAW = 16  # mean3(3) rgb(3) cov_w(6) logit_op(1) live(1) pad(2)


def pack_raw_instances(
    means: jnp.ndarray,
    rgb: jnp.ndarray,
    quats: jnp.ndarray,
    logit_opacities: jnp.ndarray,
    log_scales: jnp.ndarray,
    active: jnp.ndarray,
    bins: TileBins,
) -> jnp.ndarray:
    """ONE row-gather of raw params into [T, N_RAW, cap].

    The WORLD covariance (quat normalize -> rotmat -> Rg diag(exp(2s)) Rg^T,
    ``forward.cu:118-152``) is pose-independent, so it is computed here ONCE
    per (re)binning episode on the C gaussians — not per instance per
    tracking iteration. ``preprocess_instances`` then only pays the
    pose-dependent chain (camera transform + EWA), roughly halving the
    per-iteration XLA cost outside the fused kernel."""
    T, cap = bins.indices.shape
    qw, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    qn = jnp.maximum(jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz), 1e-12)
    w_, xq, yq, zq = qw / qn, qx / qn, qy / qn, qz / qn
    r00 = 1 - 2 * (yq * yq + zq * zq)
    r01 = 2 * (xq * yq - w_ * zq)
    r02 = 2 * (xq * zq + w_ * yq)
    r10 = 2 * (xq * yq + w_ * zq)
    r11 = 1 - 2 * (xq * xq + zq * zq)
    r12 = 2 * (yq * zq - w_ * xq)
    r20 = 2 * (xq * zq - w_ * yq)
    r21 = 2 * (yq * zq + w_ * xq)
    r22 = 1 - 2 * (xq * xq + yq * yq)
    v0 = jnp.exp(2.0 * log_scales[:, 0])
    v1 = jnp.exp(2.0 * log_scales[:, 1])
    v2 = jnp.exp(2.0 * log_scales[:, 2])
    c00 = r00 * r00 * v0 + r01 * r01 * v1 + r02 * r02 * v2
    c01 = r00 * r10 * v0 + r01 * r11 * v1 + r02 * r12 * v2
    c02 = r00 * r20 * v0 + r01 * r21 * v1 + r02 * r22 * v2
    c11 = r10 * r10 * v0 + r11 * r11 * v1 + r12 * r12 * v2
    c12 = r10 * r20 * v0 + r11 * r21 * v1 + r12 * r22 * v2
    c22 = r20 * r20 * v0 + r21 * r21 * v1 + r22 * r22 * v2
    cov6 = jnp.stack([c00, c01, c02, c11, c12, c22], axis=1)
    cols = jnp.concatenate(
        [
            means,
            rgb,
            cov6,
            logit_opacities[:, None],
            active.astype(jnp.float32)[:, None],
            jnp.zeros((means.shape[0], 2), jnp.float32),
        ],
        axis=1,
    )  # [C, N_RAW]
    idx = jnp.maximum(bins.indices, 0)
    rows = cols[idx.reshape(-1)].reshape(T, cap, N_RAW)
    k = jnp.arange(cap, dtype=jnp.int32)
    live = (k[None, :] < bins.counts[:, None]).astype(jnp.float32)
    rows = rows.at[:, :, 13].multiply(live)  # live column
    return jnp.swapaxes(rows, 1, 2)  # [T, N_RAW, cap]


def preprocess_instances(
    raw: jnp.ndarray,  # [T, N_RAW, cap]
    T_cw: jnp.ndarray,
    cam: Camera,
    scale_modifier: float = 1.0,
) -> jnp.ndarray:
    """Per-instance EWA projection -> the blend kernel's packed screen layout
    [T, 16, cap]. Same math as :func:`raster.preprocess.preprocess`
    (``forward.cu:74-256``), expressed on instance rows."""
    g = lambda r: raw[:, r, :]  # [T, cap]
    x, y, z3 = g(0), g(1), g(2)
    r_, g_, b_ = g(3), g(4), g(5)
    c00, c01, c02 = g(6), g(7), g(8)
    c11, c12, c22 = g(9), g(10), g(11)
    logit_op = g(12)
    live = g(13)

    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    tx_ = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z3 + t[0]
    ty_ = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z3 + t[1]
    tz_ = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z3 + t[2]

    in_front = tz_ > NEAR_CULL
    safe_z = jnp.where(in_front, tz_, 1.0)
    lim_x = 1.3 * cam.tan_half_fov_x
    lim_y = 1.3 * cam.tan_half_fov_y
    txz = jnp.clip(tx_ / safe_z, -lim_x, lim_x)
    tyz = jnp.clip(ty_ / safe_z, -lim_y, lim_y)

    # cov_cam = R (sm^2 cov_w) R^T: the world covariance is packed (pose-
    # independent, see pack_raw_instances); the scale_modifier^2 factor
    # folds into R so it costs nothing per instance.
    R = R * scale_modifier
    m00 = R[0, 0] * c00 + R[0, 1] * c01 + R[0, 2] * c02
    m01 = R[0, 0] * c01 + R[0, 1] * c11 + R[0, 2] * c12
    m02 = R[0, 0] * c02 + R[0, 1] * c12 + R[0, 2] * c22
    m10 = R[1, 0] * c00 + R[1, 1] * c01 + R[1, 2] * c02
    m11 = R[1, 0] * c01 + R[1, 1] * c11 + R[1, 2] * c12
    m12 = R[1, 0] * c02 + R[1, 1] * c12 + R[1, 2] * c22
    m20 = R[2, 0] * c00 + R[2, 1] * c01 + R[2, 2] * c02
    m21 = R[2, 0] * c01 + R[2, 1] * c11 + R[2, 2] * c12
    m22 = R[2, 0] * c02 + R[2, 1] * c12 + R[2, 2] * c22
    k00 = m00 * R[0, 0] + m01 * R[0, 1] + m02 * R[0, 2]
    k01 = m00 * R[1, 0] + m01 * R[1, 1] + m02 * R[1, 2]
    k02 = m00 * R[2, 0] + m01 * R[2, 1] + m02 * R[2, 2]
    k11 = m10 * R[1, 0] + m11 * R[1, 1] + m12 * R[1, 2]
    k12 = m10 * R[2, 0] + m11 * R[2, 1] + m12 * R[2, 2]
    k22 = m20 * R[2, 0] + m21 * R[2, 1] + m22 * R[2, 2]

    fx_z = cam.fx / safe_z
    fy_z = cam.fy / safe_z
    j02 = -fx_z * txz
    j12 = -fy_z * tyz
    a = fx_z * (fx_z * k00 + j02 * k02) + j02 * (fx_z * k02 + j02 * k22) + LOW_PASS
    b = fx_z * (fy_z * k01 + j12 * k02) + j02 * (fy_z * k12 + j12 * k22)
    c = fy_z * (fy_z * k11 + j12 * k12) + j12 * (fy_z * k12 + j12 * k22) + LOW_PASS

    det = a * c - b * b
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)

    # Center projected unclamped; the clamp is only for the EWA Jacobian
    # (matches raster.preprocess — ADVICE r1).
    u = cam.fx * (tx_ / safe_z) + cam.cx
    v = cam.fy * (ty_ / safe_z) + cam.cy
    valid = (live > 0.5) & in_front & det_ok
    vf = valid.astype(jnp.float32)

    zero = jnp.zeros_like(vf)
    # Conic rows carry the valid mask: invalid instances (behind camera /
    # det<=0) would otherwise hold garbage conics whose quadratic can go
    # POSITIVE — the lean fused kernel drops the per-element power<=0 gate
    # and relies on zeroed conics collapsing ln(alpha) to ln(op) = -inf.
    rows = [
        u,
        v,
        c * inv_det * vf,
        -b * inv_det * vf,
        a * inv_det * vf,
        # Opacity carries the live mask: the Pallas kernels gate contribution
        # purely on alpha, never reading the live row.
        jax.nn.sigmoid(logit_op) * vf,
        r_,
        g_,
        b_,
        jnp.where(valid, tz_, 0.0),
        vf,
        zero, zero, zero, zero, zero,
    ]
    return jnp.stack(rows, axis=1)  # [T, 16, cap]


def blend_packed_xla(
    packed: jnp.ndarray,  # [T, 16, cap] screen rows (pallas_raster layout)
    counts: jnp.ndarray,
    cam: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray | float = 0.0,
) -> RenderOutput:
    """Pure-XLA blend over the packed screen-instance layout — the portable
    fallback with identical semantics to the Pallas kernels (same math as
    :func:`tiled.render_tiled`, which is oracle-validated)."""
    from gsorb_slam_tpu.raster.binning import tile_grid_shape
    from gsorb_slam_tpu.raster.naive import MIN_ALPHA, STOP_T

    ty, tx = tile_grid_shape(cam, cfg)
    n_tiles, _, cap = packed.shape
    tsx, tsy = cfg.tile_w_px, cfg.tile_h_px
    px = tsx * tsy
    K = min(cfg.chunk, cap)
    n_chunks = cap // K

    lu, lv = jnp.meshgrid(
        jnp.arange(tsx, dtype=jnp.float32),
        jnp.arange(tsy, dtype=jnp.float32), indexing="xy",
    )
    local = jnp.stack([lu, lv], axis=-1).reshape(px, 2)
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    origin = jnp.stack(
        [(t_ids % tx) * tsx, (t_ids // tx) * tsy], -1
    ).astype(jnp.float32)
    pix = origin[:, None, :] + local[None, :, :]  # [T, px, 2]

    k_live = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
    kk = jnp.arange(K, dtype=jnp.int32)

    def chunk_step(carry, inputs):
        T, C, Dd, S, Med, done = carry
        pk, live = inputs  # [T, 12, K], [T, K]
        row = lambda r: pk[:, r, :]
        d0 = row(0)[:, None, :] - pix[..., 0:1]  # [T, px, K]
        d1 = row(1)[:, None, :] - pix[..., 1:2]
        power = (
            -0.5 * (row(2)[:, None, :] * d0 * d0 + row(4)[:, None, :] * d1 * d1)
            - row(3)[:, None, :] * d0 * d1
        )
        alpha = jnp.minimum(0.99, row(5)[:, None, :] * jnp.exp(power))
        contrib = (
            (live & (row(10) > 0.5))[:, None, :]
            & (power <= 0.0)
            & (alpha >= MIN_ALPHA)
            & ~done[..., None]
        )
        alpha = jnp.where(contrib, alpha, 0.0)
        log1m = jnp.log1p(-jnp.minimum(alpha, 0.999999))
        T_pref = T[..., None] * jnp.exp(jnp.cumsum(log1m, axis=-1) - log1m)
        crosses = contrib & (T_pref * (1.0 - alpha) < STOP_T)
        blocked = jnp.cumsum(crosses.astype(jnp.int32), axis=-1) > 0
        apply = contrib & ~blocked
        w = jnp.where(apply, alpha * T_pref, 0.0)
        C = C + jnp.stack(
            [jnp.einsum("tpk,tk->tp", w, row(6 + ch)) for ch in range(3)], -1
        )
        z = row(9)
        Dd = Dd + jnp.einsum("tpk,tk->tp", w, z)
        S = S + jnp.sum(w, axis=-1)
        is_med = apply & (T_pref > 0.5)
        last = jnp.max(jnp.where(is_med, kk[None, None, :] + 1, 0), axis=-1)
        onehot = (kk[None, None, :] + 1) == last[..., None]
        z_sel = jnp.sum(jnp.where(onehot, z[:, None, :], 0.0), axis=-1)
        Med = jnp.where(last > 0, z_sel, Med)
        T = T * jnp.exp(jnp.sum(jnp.where(apply, log1m, 0.0), axis=-1))
        done = done | jnp.any(crosses, axis=-1)
        return (T, C, Dd, S, Med, done), None

    n_attr = packed.shape[1]
    resh_p = jnp.moveaxis(
        packed.reshape(n_tiles, n_attr, n_chunks, K), 2, 0
    )  # [n_chunks, T, n_attr, K]
    resh_l = jnp.moveaxis(k_live.reshape(n_tiles, n_chunks, K), 1, 0)
    init = (
        jnp.ones((n_tiles, px), jnp.float32),
        jnp.zeros((n_tiles, px, 3), jnp.float32),
        jnp.zeros((n_tiles, px), jnp.float32),
        jnp.zeros((n_tiles, px), jnp.float32),
        jnp.zeros((n_tiles, px), jnp.float32),
        jnp.zeros((n_tiles, px), bool),
    )
    (T, C, Dd, S, Med, _), _ = jax.lax.scan(
        jax.checkpoint(chunk_step), init, (resh_p, resh_l)
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
        radii=jnp.zeros((packed.shape[0],)),
    )


def render_instances(
    raw: jnp.ndarray,
    counts: jnp.ndarray,
    T_cw: jnp.ndarray,
    cam: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray | float = 0.0,
    interpret: bool | None = None,
    scale_modifier: float = 1.0,
) -> RenderOutput:
    """Render from raw tile-instances at an arbitrary (differentiable) pose.

    Pallas blend on TPU; XLA blend elsewhere (interpret-mode Pallas is far
    too slow for the CPU test suite)."""
    screen = preprocess_instances(raw, T_cw, cam, scale_modifier)
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from gsorb_slam_tpu.raster.pallas_raster import blend_and_untile

        return blend_and_untile(screen, counts, cam, cfg, bg, interpret)
    return blend_packed_xla(screen, counts, cam, cfg, bg)
