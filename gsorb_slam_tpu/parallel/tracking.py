"""Multi-chip tracking: the fused pose-refinement iteration sharded by TILE.

The reference tracks on one GPU (``src/Render.cc:985-1141``); here the
render+loss+backward launch is data-parallel over the camera's tile grid:

- the Gaussian map and pose state are REPLICATED,
- the per-tile instance pack / gt tiles / counts are SHARDED over the
  ``view`` mesh axis, round-robin (strided) so spatially-correlated
  instance counts load-balance,
- each chip runs the fused tracking kernel on its tile strip (the kernel's
  ``tile_ids`` prefetch operand maps local rows to global tile origins),
- ONE ``psum`` per iteration reduces the scalar losses and the 7-dof pose
  gradient over ICI — bytes per step are O(1), not O(pixels).

The feature chi^2 term and the pose Adam step are computed replicated
(identical on every chip), so replicas stay bit-identical with zero
parameter traffic, exactly like the mapping path (``parallel/mesh.py``).

Rebinning episodes segment the iteration loop (same structure as
``slam/tracking.track_frame``): binning runs replicated between segments,
then the fresh pack is re-sharded. ICI cost: one [T-strip] scatter per
segment, 2-3 segments per frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import TrackingConfig, default_rebin_iters
from gsorb_slam_tpu.core.transforms import matrix_to_pose, pose_to_matrix
from gsorb_slam_tpu.parallel.mesh import VIEW_AXIS, Mesh
from gsorb_slam_tpu.raster.binning import TileBins, bin_gaussians
from gsorb_slam_tpu.raster.instances import (
    pack_raw_instances,
    preprocess_instances,
)
from gsorb_slam_tpu.raster.pallas_raster import tile_gt_images, tracking_loss_grad
from gsorb_slam_tpu.raster.preprocess import preprocess
from gsorb_slam_tpu.raster.types import RasterConfig
from gsorb_slam_tpu.slam.tracking import (
    CHI2_INLIER,
    FeatureMatches,
    TrackResult,
    reprojection_chi2,
)
from gsorb_slam_tpu.splat.gaussians import (
    GaussianMap,
    init_pose_state,
    pose_adam_step,
)


def strided_tile_perm(n_tiles: int, n_dev: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Round-robin tile assignment under contiguous-block sharding of the
    leading dim: sharded row ``s*Tl + j`` (shard s, local row j) holds
    global tile ``j*n_dev + s``. Returns ``(perm, is_pad)`` of length
    ``n_tiles`` rounded up to a multiple of ``n_dev``; pad rows repeat tile
    0 and are flagged so their instance counts can be zeroed."""
    Tp = ((n_tiles + n_dev - 1) // n_dev) * n_dev
    perm = jnp.arange(Tp, dtype=jnp.int32).reshape(Tp // n_dev, n_dev)
    perm = perm.T.reshape(-1)
    is_pad = perm >= n_tiles
    return jnp.where(is_pad, 0, perm), is_pad


def parallel_track_frame(
    gm: GaussianMap,
    T_cw_init: jnp.ndarray,
    gt_color: jnp.ndarray,  # [H, W, 3]
    gt_depth: jnp.ndarray,  # [H, W], 0 = invalid
    matches: FeatureMatches,
    cam: Camera,
    tcfg: TrackingConfig,
    rcfg: RasterConfig,
    mesh: Mesh,
    num_iters: int | None = None,
    scale_modifier: float = 1.0,
    rebin_iters: tuple[int, ...] | None = None,
) -> TrackResult:
    """Tile-sharded twin of ``slam.tracking.track_frame`` (pallas backend).

    Call under ``jax.jit``; the iteration loop runs inside ``shard_map``
    with a replicated scalar carry, one pose-gradient ``psum`` per step.
    Semantics match the single-chip fast path up to psum reduction order
    (validated in tests/test_parallel.py).
    """
    num_iters = int(num_iters or tcfg.num_iters)
    if rebin_iters is None:
        rebin_iters = getattr(tcfg, "rebin_iters", None)
    if rebin_iters is None:  # budget-adaptive default (see config.py)
        rebin_iters = default_rebin_iters(num_iters)
    rebin_iters = tuple(r for r in rebin_iters if 0 < r < num_iters)
    n_dev = mesh.shape[VIEW_AXIS]

    quat0, trans0 = matrix_to_pose(T_cw_init)
    ps0 = init_pose_state(quat0, trans0)
    regate_iter = num_iters // 2

    gt4 = tile_gt_images(gt_color, gt_depth, cam, rcfg)  # [T, 8, px]
    n_tiles = gt4.shape[0]
    perm, is_pad = strided_tile_perm(n_tiles, n_dev)

    sh_tiles = NamedSharding(mesh, P(VIEW_AXIS))
    gt4_p = jax.device_put(gt4[perm], sh_tiles)
    tids_p = jax.device_put(perm, sh_tiles)

    def build_bins(T_cw):
        prep0 = preprocess(
            gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
            gm.active, jax.lax.stop_gradient(T_cw), cam, scale_modifier,
        )
        return bin_gaussians(prep0, cam, rcfg)

    def build_pack(b: TileBins):
        raw = jax.lax.stop_gradient(
            pack_raw_instances(
                gm.means, gm.rgb, gm.quats, gm.logit_opacities,
                gm.log_scales, gm.active, b,
            )
        )
        counts = jnp.where(is_pad, 0, b.counts[perm])
        return (
            jax.device_put(raw[perm], sh_tiles),
            jax.device_put(counts, sh_tiles),
        )

    def make_run_segment(seg_start: int, seg_end: int):
        """Build the shard_map'd segment runner for STATIC iteration bounds
        (a static-trip fori_loop pipelines without the while cond's scalar
        round-trip when early stopping is disabled — see track_frame)."""

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(),
            ),
            out_specs=P(),
            # The pallas launch + loop carries mix replicated and sharded
            # inits; the per-iteration psum restores replication regardless
            # (same rationale as parallel/mesh.py).
            check_vma=False,
        )
        def run_segment(raw_l, counts_l, tids_l, gt4_l, carry):
            def value_and_grad_iter(quat, trans, inlier_mask):
                screen, vjp = jax.vjp(
                    lambda q, t: preprocess_instances(
                        raw_l, pose_to_matrix(q, t), cam, scale_modifier
                    ),
                    quat, trans,
                )
                img_l1, dep_l1, d_screen = tracking_loss_grad(
                    screen, counts_l, gt4_l, cam, rcfg,
                    tcfg.im_weight, tcfg.depth_weight, tcfg.use_sur_depth,
                    tile_ids=tids_l,
                )
                gq1, gt1 = vjp(d_screen)
                # ONE psum carries the shard-local losses + 7-dof gradient.
                img_l1, dep_l1, gq1, gt1 = jax.lax.psum(
                    (img_l1, dep_l1, gq1, gt1), VIEW_AXIS
                )

                def chi2_fn(q, t):  # replicated, no psum
                    chi2 = reprojection_chi2(pose_to_matrix(q, t), matches, cam)
                    chi2 = jnp.where(matches.valid & inlier_mask, chi2, 0.0)
                    return tcfg.feature_weight * jnp.sum(chi2), chi2

                (chi2_l, chi2_raw), (gq2, gt2) = jax.value_and_grad(
                    chi2_fn, argnums=(0, 1), has_aux=True
                )(quat, trans)
                loss = img_l1 + dep_l1 + chi2_l
                return (loss, chi2_raw), (gq1 + gq2, gt1 + gt2)

            def step(carry):
                (ps, inliers, best_q, best_t, best_loss, last_loss, it,
                 n_applied) = carry
                (loss, _chi2), (gq, gt_) = value_and_grad_iter(
                    ps.quat, ps.trans, inliers
                )
                inliers = jnp.where(
                    it == regate_iter,
                    reprojection_chi2(
                        pose_to_matrix(ps.quat, ps.trans), matches, cam
                    )
                    < CHI2_INLIER,
                    inliers,
                )
                improved = jnp.isfinite(loss) & (loss < best_loss)
                best_q = jnp.where(improved, ps.quat, best_q)
                best_t = jnp.where(improved, ps.trans, best_t)
                best_loss = jnp.where(improved, loss, best_loss)
                converged = jnp.abs(last_loss - loss) < tcfg.early_stop_delta
                it_next = jnp.where(converged, num_iters, it + 1)
                ps = pose_adam_step(ps, gq, gt_, tcfg)
                return (ps, inliers, best_q, best_t, best_loss, loss, it_next,
                        n_applied + 1)

            if tcfg.early_stop_delta <= 0.0:
                return jax.lax.fori_loop(
                    0, seg_end - seg_start, lambda _i, c: step(c), carry
                )
            return jax.lax.while_loop(
                lambda c: c[6] < seg_end, step, carry
            )

        return run_segment

    inliers0 = jnp.ones_like(matches.valid)
    carry = (
        ps0,
        inliers0,
        quat0,
        trans0,
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )

    bins = build_bins(T_cw_init)
    raw_p, counts_p = build_pack(bins)

    boundaries = list(sorted(rebin_iters)) + [num_iters]
    seg_start = 0
    for i, seg_end in enumerate(boundaries):
        if i > 0:
            ps_cur = carry[0]
            b = build_bins(pose_to_matrix(ps_cur.quat, ps_cur.trans))
            raw_p, counts_p = build_pack(b)
        carry = make_run_segment(seg_start, seg_end)(
            raw_p, counts_p, tids_p, gt4_p, carry
        )
        seg_start = seg_end

    (ps, inliers, best_q, best_t, best_loss, _, _, n_applied) = carry
    T_best = pose_to_matrix(best_q, best_t)
    chi2_final = reprojection_chi2(T_best, matches, cam)
    return TrackResult(
        T_cw=T_best,
        loss=best_loss,
        n_iters=n_applied,
        chi2=chi2_final,
        inliers=inliers & matches.valid,
    )
