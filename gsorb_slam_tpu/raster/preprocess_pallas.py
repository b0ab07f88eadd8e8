"""Pallas kernel pair for the per-iteration instance EWA projection.

``preprocess_instances`` (raster/instances.py) is pure elementwise math
(~130 MFLOP at VGA), but as XLA it materializes ~60 [T, cap] intermediates
to HBM per direction — measured ~1.0 ms/iteration of the 11.9 ms tracking
step (r3 speed-of-light table). This kernel pair keeps the whole chain in
VMEM: forward reads the raw pack once and writes the screen pack once
(~56 MB round trip ≈ 70 us at HBM speed); backward re-derives the chain
with ``jax.vjp`` *inside* the kernel (linearization happens at trace time
— no hand-written EWA adjoint to maintain) and reduces straight to the
12 pose cotangents.

Gradient contract: only the POSE (T_cw) cotangent is produced — the
tracking path wraps ``raw`` in stop_gradient (raster/instances.py docstring)
— ``d_raw`` is returned as zeros. Mapping optimizes splat parameters
through the per-Gaussian ``raster/preprocess.py`` path, never this one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster.preprocess import LOW_PASS, NEAR_CULL

N_RAW = 16
N_SCREEN = 16


def _ewa_rows(g, rget, cam: Camera, scale_modifier: float):
    """The EWA projection on attribute rows. ``g(r)`` returns raw row ``r``
    (any [...] shape); ``rget(k)`` returns pose element ``k`` of the flat
    R-row-major-then-t layout — a scalar, or a per-row [G, 1] column (the
    backward kernel gives every block row its own pose copy so the vjp
    transpose reduces over LANES only; Mosaic rejects offset-layout
    sublane+lane multi-reductions). Mirrors
    :func:`raster.instances.preprocess_instances` exactly."""
    x, y, z3 = g(0), g(1), g(2)
    r_, g_, b_ = g(3), g(4), g(5)
    c00, c01, c02 = g(6), g(7), g(8)
    c11, c12, c22 = g(9), g(10), g(11)
    logit_op = g(12)
    live = g(13)

    R = [[rget(3 * i + j) for j in range(3)] for i in range(3)]
    t = [rget(9), rget(10), rget(11)]
    tx_ = R[0][0] * x + R[0][1] * y + R[0][2] * z3 + t[0]
    ty_ = R[1][0] * x + R[1][1] * y + R[1][2] * z3 + t[1]
    tz_ = R[2][0] * x + R[2][1] * y + R[2][2] * z3 + t[2]

    in_front = tz_ > NEAR_CULL
    safe_z = jnp.where(in_front, tz_, 1.0)
    lim_x = 1.3 * cam.tan_half_fov_x
    lim_y = 1.3 * cam.tan_half_fov_y
    txz = jnp.clip(tx_ / safe_z, -lim_x, lim_x)
    tyz = jnp.clip(ty_ / safe_z, -lim_y, lim_y)

    sm = scale_modifier
    Rs = [[R[i][j] * sm for j in range(3)] for i in range(3)]
    cw = [[c00, c01, c02], [c01, c11, c12], [c02, c12, c22]]
    M = [
        [sum(Rs[i][k] * cw[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    Km = [
        [sum(M[i][k] * Rs[j][k] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]

    fx_z = cam.fx / safe_z
    fy_z = cam.fy / safe_z
    j02 = -fx_z * txz
    j12 = -fy_z * tyz
    a = (
        fx_z * (fx_z * Km[0][0] + j02 * Km[0][2])
        + j02 * (fx_z * Km[0][2] + j02 * Km[2][2])
        + LOW_PASS
    )
    b = fx_z * (fy_z * Km[0][1] + j12 * Km[0][2]) + j02 * (
        fy_z * Km[1][2] + j12 * Km[2][2]
    )
    c = (
        fy_z * (fy_z * Km[1][1] + j12 * Km[1][2])
        + j12 * (fy_z * Km[1][2] + j12 * Km[2][2])
        + LOW_PASS
    )

    det = a * c - b * b
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)

    u = cam.fx * (tx_ / safe_z) + cam.cx
    v = cam.fy * (ty_ / safe_z) + cam.cy
    valid = (live > 0.5) & in_front & det_ok
    vf = valid.astype(jnp.float32)
    zero = jnp.zeros_like(vf)
    return [
        u,
        v,
        c * inv_det * vf,
        -b * inv_det * vf,
        a * inv_det * vf,
        jax.nn.sigmoid(logit_op) * vf,
        r_,
        g_,
        b_,
        jnp.where(valid, tz_, 0.0),
        vf,
        zero, zero, zero, zero, zero,
    ]


def _fwd_kernel(rt_ref, raw_ref, out_ref, *, cam, sm):
    Rt = rt_ref[...]  # [G, 128] per-row pose copies
    rows = _ewa_rows(
        lambda r: raw_ref[:, r, :], lambda k: Rt[:, k : k + 1], cam, sm
    )
    for i, row in enumerate(rows):
        out_ref[:, i, :] = row


def _bwd_kernel(rt_ref, raw_ref, dout_ref, drt_ref, acc_ref, *, cam, sm, n_steps):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    raw = raw_ref[...]
    dout = dout_ref[...]

    # The 12 pose elements enter the vjp as SEPARATE [G, 1] arguments:
    # packing them in one [G, 128] row makes the slice transpose emit a
    # pad+concat (vector<G x 11> ++ vector<G x 1>) that hardware Mosaic
    # rejects ("result/input offset mismatch on non-concat dimension").
    def f(*cols):  # 12 x [G, 1] pose columns
        rows = _ewa_rows(lambda r: raw[:, r, :], lambda k: cols[k], cam, sm)
        return jnp.stack(rows, axis=1)

    _, f_vjp = jax.vjp(f, *(rt_ref[:, k : k + 1] for k in range(12)))
    dcols = f_vjp(dout)  # 12 x [G, 1] — lane-only reductions only
    for k in range(12):
        acc_ref[:, k : k + 1] = acc_ref[:, k : k + 1] + dcols[k]

    @pl.when(s == n_steps - 1)
    def _():
        drt_ref[...] = acc_ref[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def preprocess_instances_pallas(
    raw: jnp.ndarray,  # [T, N_RAW, cap]
    rt: jnp.ndarray,  # [12] flat R (row-major) then t
    cam: Camera,
    scale_modifier: float,
    group: int,
    interpret: bool,
) -> jnp.ndarray:
    return _fwd_impl(raw, rt, cam, scale_modifier, group, interpret)


def _pad_tiles(x, G):
    T = x.shape[0]
    Tp = -(-T // G) * G
    if Tp == T:
        return x, T
    return jnp.concatenate(
        [x, jnp.zeros((Tp - T,) + x.shape[1:], x.dtype)], 0
    ), T


def _rt_rows(rt, G):
    return jnp.broadcast_to(
        jnp.zeros((128,), jnp.float32).at[:12].set(rt)[None, :], (G, 128)
    )


def _fwd_impl(raw, rt, cam, sm, G, interpret):
    raw_p, T = _pad_tiles(raw, G)
    Tp, _, cap = raw_p.shape
    rt_row = _rt_rows(rt, G)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cam=cam, sm=sm),
        grid=(Tp // G,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N_RAW, cap), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, N_SCREEN, cap), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N_SCREEN, cap), jnp.float32),
        interpret=interpret,
    )(rt_row, raw_p)
    return out[:T]


def _vjp_fwd(raw, rt, cam, sm, G, interpret):
    return _fwd_impl(raw, rt, cam, sm, G, interpret), (raw, rt)


def _vjp_bwd(cam, sm, G, interpret, res, d_out):
    raw, rt = res
    raw_p, T = _pad_tiles(raw, G)
    dout_p, _ = _pad_tiles(d_out, G)
    Tp, _, cap = raw_p.shape
    n_steps = Tp // G
    rt_row = _rt_rows(rt, G)
    drt = pl.pallas_call(
        functools.partial(_bwd_kernel, cam=cam, sm=sm, n_steps=n_steps),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N_RAW, cap), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N_SCREEN, cap), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, 128), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, 128), jnp.float32)],
        interpret=interpret,
    )(rt_row, raw_p, dout_p)
    # d_raw: zeros by contract (tracking stop-gradients the pack).
    return jnp.zeros_like(raw), jnp.sum(drt[:, :12], axis=0)


preprocess_instances_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def rt_from_matrix(T_cw: jnp.ndarray) -> jnp.ndarray:
    """[4,4] -> flat [12] (R row-major, then t) — differentiable."""
    return jnp.concatenate(
        [T_cw[:3, :3].reshape(-1), T_cw[:3, 3]], 0
    ).astype(jnp.float32)
