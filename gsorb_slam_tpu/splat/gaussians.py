"""Gaussian map state: fixed-capacity padded pytree + masked Adam.

TPU-native replacement for the reference's ``Gaussian`` class
(``src/Gaussian.cc``, ``include/Gaussian.h:75-247``). The reference keeps five
growable torch leaf tensors and performs *optimizer-state surgery* on every
densify/prune (``CatTensorToOptimizer`` ``src/Gaussian.cc:241-258``,
``PruneOptimizer`` ``:223-239``) — reallocation patterns XLA cannot compile.
Here the map lives in arrays of static capacity ``C`` with an ``active`` mask:

- densify  = scatter new rows into dead slots (``add_points``)     → O(M) writes
- prune    = clear mask bits (``prune_low_opacity``)               → O(C) mask op
- compact  = stable partition of live rows to the front (episodic)

Adam moments live in the same pytree, so "surgery" is just the same scatter /
mask applied to the moments: new rows start with zero moments and inherit the
global step count, exactly the torch semantics after a concat. Per-parameter
learning rates and ``eps=1e-15`` mirror ``CreateOptimizerForGaussian``
(``src/Gaussian.cc:158-182``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from gsorb_slam_tpu.core.config import MappingConfig, TrackingConfig

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15  # src/Gaussian.cc:153,171


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianMap:
    """Padded splat parameters + Adam state. All arrays have leading dim C."""

    means: jnp.ndarray  # [C, 3] world-frame centers        (mMean3D)
    rgb: jnp.ndarray  # [C, 3] linear colors              (mRgb)
    quats: jnp.ndarray  # [C, 4] unnormalized wxyz          (mUnnormQuat)
    logit_opacities: jnp.ndarray  # [C]                     (mLogitOpacities)
    log_scales: jnp.ndarray  # [C, 3]                       (mLogScales)
    active: jnp.ndarray  # [C] bool — live splats
    count: jnp.ndarray  # [] int32 — write cursor (slots ever allocated)
    adam_m: Any  # dict of first moments, same shapes as params
    adam_v: Any  # dict of second moments
    adam_t: jnp.ndarray  # [] int32 — global Adam step (torch per-tensor step)
    scene_radius: jnp.ndarray  # [] f32 — maxZ / raduisDepthRatio (mSceneRadius)
    max_z: jnp.ndarray  # [] f32 — running max observed depth (mMaxZ)

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def params(self) -> dict[str, jnp.ndarray]:
        return {
            "means": self.means,
            "rgb": self.rgb,
            "quats": self.quats,
            "logit_opacities": self.logit_opacities,
            "log_scales": self.log_scales,
        }

    def n_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))


_PARAM_NAMES = ("means", "rgb", "quats", "logit_opacities", "log_scales")


def _zeros_like_params(capacity: int) -> dict[str, jnp.ndarray]:
    return {
        "means": jnp.zeros((capacity, 3), jnp.float32),
        "rgb": jnp.zeros((capacity, 3), jnp.float32),
        "quats": jnp.zeros((capacity, 4), jnp.float32),
        "logit_opacities": jnp.zeros((capacity,), jnp.float32),
        "log_scales": jnp.zeros((capacity, 3), jnp.float32),
    }


def empty_map(capacity: int) -> GaussianMap:
    p = _zeros_like_params(capacity)
    return GaussianMap(
        means=p["means"],
        rgb=p["rgb"],
        quats=p["quats"].at[:, 0].set(1.0),
        logit_opacities=p["logit_opacities"],
        log_scales=p["log_scales"],
        active=jnp.zeros((capacity,), bool),
        count=jnp.zeros((), jnp.int32),
        adam_m=_zeros_like_params(capacity),
        adam_v=_zeros_like_params(capacity),
        adam_t=jnp.zeros((), jnp.int32),
        scene_radius=jnp.asarray(1.0, jnp.float32),
        max_z=jnp.zeros((), jnp.float32),
    )


def single_pixel_log_scale(
    z_cam: jnp.ndarray, fx: float, fy: float
) -> jnp.ndarray:
    """The default splat scale initializer (``initScalarMethod=2`` in every
    shipped YAML): an isotropic scale of one pixel footprint at depth z,
    ``log(|z| / ((fx+fy)/2))`` (``src/Gaussian.cc:73-78``).

    The reference feeds the *world*-frame z here because ``ProjectPixel``
    hands it world points (``src/Render.cc:616-654``); that is only the depth
    for the identity-pose first frame. We use the camera depth (the evident
    intent) — callers pass ``z_cam``.
    """
    return jnp.log(jnp.maximum(jnp.abs(z_cam) / ((fx + fy) * 0.5), 1e-7))


def add_points(
    gm: GaussianMap,
    means: jnp.ndarray,  # [M, 3] world points
    rgb: jnp.ndarray,  # [M, 3]
    z_cam: jnp.ndarray,  # [M] camera-frame depths (for scale init)
    valid: jnp.ndarray,  # [M] bool — which candidates to insert
    fx: float,
    fy: float,
    init_scalar_method: int = 2,
) -> GaussianMap:
    """Densify: scatter valid candidate splats at the write cursor.

    Equivalent of ``Gaussian::AddGaussianPoints`` (``src/Gaussian.cc:50-95``)
    + ``CatTensorToOptimizer`` (``:241-258``): new rows get quat=identity,
    logit-opacity=1, scale per ``init_scalar_method`` (0: 3-NN distance,
    1: clamped 3-NN, 2: SinglePixel — the default in every shipped YAML),
    zero Adam moments.

    Slot assignment RECYCLES dead rows (pruned holes below the high-water
    mark fill first, then the virgin tail), so a capacity-full map keeps
    accepting splats as long as pruning frees rows — the bounded-capacity
    analog of the reference's unbounded tensor concat (VERDICT r3 item 4).
    Only candidates beyond the TOTAL dead-slot count are dropped. Caveat
    shared with plain appends: tile bins cached before this call don't see
    the new rows (and a recycled row briefly inherits the dead splat's
    stale bin entries) until the next (re)binning episode — the System
    rebins the current frame right after densify and refreshes keyframe
    bins on a TTL.
    """
    capacity = gm.capacity
    valid = valid.astype(bool)

    if init_scalar_method == 2:
        log_scale_1d = single_pixel_log_scale(z_cam, fx, fy)
    else:
        from gsorb_slam_tpu.ops.knn import knn3_mean_sq_dist_exact

        dist2 = jnp.maximum(knn3_mean_sq_dist_exact(means, valid), 1e-7)
        d = jnp.sqrt(dist2)
        if init_scalar_method == 1:  # DistanceMean: clamp at 8x mean
            denom = jnp.maximum(jnp.sum(valid), 1)
            mean_d = jnp.sum(jnp.where(valid, d, 0.0)) / denom
            d = jnp.minimum(d, 8.0 * mean_d)
        log_scale_1d = jnp.log(d)
    # Slot for the i-th valid candidate = index of the (i+1)-th DEAD row
    # (holes below the high-water mark in index order, then the tail).
    # searchsorted over the dead-count prefix sum finds it without a sort.
    dead_cum = jnp.cumsum((~gm.active).astype(jnp.int32))
    n_dead = dead_cum[-1]
    ranks = jnp.cumsum(valid.astype(jnp.int32)) - 1  # 0-based among valid
    applied = valid & (ranks < n_dead)
    slots = jnp.searchsorted(dead_cum, ranks + 1, side="left").astype(jnp.int32)
    slots = jnp.where(applied, slots, capacity)  # capacity => dropped

    def scat(dst, src):
        return dst.at[slots].set(src, mode="drop")

    # High-water mark: rows >= count stay permanently dead (prefix_view
    # contract) — only tail allocations raise it.
    new_count = jnp.maximum(
        gm.count, jnp.max(jnp.where(applied, slots + 1, 0), initial=0)
    ).astype(jnp.int32)

    def src_shape(name):
        return {
            "means": means,
            "rgb": rgb,
            "quats": jnp.zeros(means.shape[:1] + (4,), jnp.float32).at[:, 0].set(1.0),
            "logit_opacities": jnp.ones(means.shape[:1], jnp.float32),
            "log_scales": jnp.tile(log_scale_1d[:, None], (1, 3)),
        }[name]

    new_params = {k: scat(getattr(gm, k), src_shape(k)) for k in _PARAM_NAMES}
    m = {k: scat(gm.adam_m[k], jnp.zeros_like(src_shape(k))) for k in _PARAM_NAMES}
    v = {k: scat(gm.adam_v[k], jnp.zeros_like(src_shape(k))) for k in _PARAM_NAMES}

    return dataclasses.replace(
        gm,
        **new_params,
        active=gm.active.at[slots].set(True, mode="drop"),
        count=new_count,
        adam_m=m,
        adam_v=v,
    )


def prefix_view(gm: GaussianMap, n: int) -> GaussianMap:
    """Static-prefix slice of every per-splat leaf.

    Splats are appended at the write cursor and ``compact`` repacks live
    rows to the front, so rows [count, C) are permanently dead. Render-path
    ops (preprocess, binning, packing) scale with the PHYSICAL capacity —
    slicing to a power-of-two bucket just above ``count`` makes a large
    safety capacity free until actually used. Row indices into the view
    are identical to global indices (it is a prefix)."""
    n = min(int(n), gm.means.shape[0])
    sl = lambda a: a[:n]
    return dataclasses.replace(
        gm,
        means=sl(gm.means),
        rgb=sl(gm.rgb),
        quats=sl(gm.quats),
        logit_opacities=sl(gm.logit_opacities),
        log_scales=sl(gm.log_scales),
        active=sl(gm.active),
        adam_m={k: sl(v) for k, v in gm.adam_m.items()},
        adam_v={k: sl(v) for k, v in gm.adam_v.items()},
    )


def prefix_writeback(gm_full: GaussianMap, gm_part: GaussianMap) -> GaussianMap:
    """Write an updated prefix view back into the full-capacity map."""
    wb = lambda full, part: full.at[: part.shape[0]].set(part)
    return dataclasses.replace(
        gm_full,
        means=wb(gm_full.means, gm_part.means),
        rgb=wb(gm_full.rgb, gm_part.rgb),
        quats=wb(gm_full.quats, gm_part.quats),
        logit_opacities=wb(gm_full.logit_opacities, gm_part.logit_opacities),
        log_scales=wb(gm_full.log_scales, gm_part.log_scales),
        active=wb(gm_full.active, gm_part.active),
        adam_m={
            k: wb(gm_full.adam_m[k], gm_part.adam_m[k]) for k in gm_full.adam_m
        },
        adam_v={
            k: wb(gm_full.adam_v[k], gm_part.adam_v[k]) for k in gm_full.adam_v
        },
        count=gm_part.count,
        adam_t=gm_part.adam_t,
        scene_radius=gm_part.scene_radius,
        max_z=gm_part.max_z,
    )


def prune_low_opacity(gm: GaussianMap, threshold: float = 0.005) -> GaussianMap:
    """Deactivate splats with sigmoid(opacity) < threshold
    (``RemoveLowOpcitiesGaussian`` ``src/Gaussian.cc:180-185``). Rows stay
    allocated until the next :func:`compact`."""
    low = jax.nn.sigmoid(gm.logit_opacities) < threshold
    return dataclasses.replace(gm, active=gm.active & ~low)


def prune_to_budget(gm: GaussianMap, target_frac: float = 0.85) -> GaussianMap:
    """Capacity pressure valve: when the live count exceeds
    ``target_frac * capacity``, deactivate the LOWEST-opacity live splats
    down to the target (mask-only — cached bins stay valid; freed rows are
    recycled by :func:`add_points`).

    The reference never needs this (it reallocates unboundedly and prunes
    only ``sigmoid(op) < 0.005`` every 50 frames, ``src/Render.cc:211-217``);
    at a bounded capacity the weakest splats are the principled overflow
    victims — they contribute least blended weight.
    """
    target = jnp.asarray(target_frac * gm.capacity, jnp.float32)
    n_live = gm.n_active()
    n_cut = jnp.maximum(n_live - target.astype(jnp.int32), 0)
    # Threshold = n_cut-th smallest live opacity (dead rows sort to +inf).
    key = jnp.where(gm.active, gm.logit_opacities, jnp.inf)
    order = jnp.sort(key)
    thresh = order[jnp.clip(n_cut, 0, gm.capacity - 1)]
    # Strictly-below keeps at least the target (ties above thresh survive).
    cut = gm.active & (gm.logit_opacities < thresh)
    return dataclasses.replace(gm, active=gm.active & ~cut)


def compact(gm: GaussianMap) -> GaussianMap:
    """Episodic defragmentation: stable-partition live rows to the front so
    the write cursor regains pruned slots. Replaces the reference's
    ``PruneOptimizer`` index-select surgery (``src/Gaussian.cc:223-239``)."""
    order = jnp.argsort(~gm.active, stable=True)
    take = lambda a: a[order]
    return dataclasses.replace(
        gm,
        means=take(gm.means),
        rgb=take(gm.rgb),
        quats=take(gm.quats),
        logit_opacities=take(gm.logit_opacities),
        log_scales=take(gm.log_scales),
        active=take(gm.active),
        count=gm.n_active(),
        adam_m={k: take(v) for k, v in gm.adam_m.items()},
        adam_v={k: take(v) for k, v in gm.adam_v.items()},
    )


def map_learning_rates(cfg: MappingConfig) -> dict[str, float]:
    return {
        "means": cfg.lr_mean3d,
        "rgb": cfg.lr_rgb,
        "quats": cfg.lr_unnorm_rotation,
        "logit_opacities": cfg.lr_logit_opacities,
        "log_scales": cfg.lr_log_scales,
    }


def adam_step(
    gm: GaussianMap, grads: dict[str, jnp.ndarray], lrs: dict[str, float]
) -> GaussianMap:
    """One masked Adam step over all five splat parameter groups
    (``StepUpdataForGaussian`` ``src/Gaussian.cc:136-141`` +
    ``CreateOptimizerForGaussian`` ``:158-182``). Inactive rows are frozen."""
    t = gm.adam_t + 1
    tf = t.astype(jnp.float32)
    c1 = 1.0 - ADAM_B1**tf
    c2 = 1.0 - ADAM_B2**tf
    new_params, new_m, new_v = {}, {}, {}
    for k in _PARAM_NAMES:
        p = getattr(gm, k)
        g = grads[k]
        mask = gm.active.astype(p.dtype)
        mask = mask.reshape((-1,) + (1,) * (p.ndim - 1))
        g = g * mask
        m = ADAM_B1 * gm.adam_m[k] + (1 - ADAM_B1) * g
        v = ADAM_B2 * gm.adam_v[k] + (1 - ADAM_B2) * g * g
        update = (m / c1) / (jnp.sqrt(v / c2) + ADAM_EPS)
        new_params[k] = p - lrs[k] * update * mask
        new_m[k] = m * mask
        new_v[k] = v * mask
    return dataclasses.replace(
        gm, **new_params, adam_m=new_m, adam_v=new_v, adam_t=t
    )


# ---------------------------------------------------------------------------
# Camera pose optimization state (mCamUnnormQuat / mCamTrans,
# include/Gaussian.h:199-200, src/Gaussian.cc:98-176)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseState:
    quat: jnp.ndarray  # [4] unnormalized wxyz
    trans: jnp.ndarray  # [3]
    m_quat: jnp.ndarray
    v_quat: jnp.ndarray
    m_trans: jnp.ndarray
    v_trans: jnp.ndarray
    t: jnp.ndarray  # [] int32


def init_pose_state(quat: jnp.ndarray, trans: jnp.ndarray) -> PoseState:
    """Fresh pose + Adam state per tracked frame (``InitCameraPose``
    ``src/Gaussian.cc:98-128`` + ``CreateOptimizerForPose`` ``:144-156``)."""
    z4 = jnp.zeros((4,), jnp.float32)
    z3 = jnp.zeros((3,), jnp.float32)
    return PoseState(
        quat=quat.astype(jnp.float32),
        trans=trans.astype(jnp.float32),
        m_quat=z4,
        v_quat=z4,
        m_trans=z3,
        v_trans=z3,
        t=jnp.zeros((), jnp.int32),
    )


def pose_adam_step(
    ps: PoseState,
    g_quat: jnp.ndarray,
    g_trans: jnp.ndarray,
    cfg: TrackingConfig,
) -> PoseState:
    """Adam on (quat, trans). Note the reference constructs *both* param
    groups with the quaternion LR (``src/Gaussian.cc:150-151``) — its
    ``lrsCamTrans`` YAML knob is dead. We honor the configured values;
    the shipped YAMLs keep them within 10% of each other."""
    t = ps.t + 1
    tf = t.astype(jnp.float32)
    c1 = 1.0 - ADAM_B1**tf
    c2 = 1.0 - ADAM_B2**tf

    def upd(p, m, v, g, lr):
        m = ADAM_B1 * m + (1 - ADAM_B1) * g
        v = ADAM_B2 * v + (1 - ADAM_B2) * g * g
        return p - lr * (m / c1) / (jnp.sqrt(v / c2) + ADAM_EPS), m, v

    q, mq, vq = upd(ps.quat, ps.m_quat, ps.v_quat, g_quat, cfg.lr_cam_quat)
    tr, mt, vt = upd(ps.trans, ps.m_trans, ps.v_trans, g_trans, cfg.lr_cam_trans)
    return PoseState(quat=q, trans=tr, m_quat=mq, v_quat=vq, m_trans=mt, v_trans=vt, t=t)
