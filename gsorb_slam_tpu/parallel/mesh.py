"""Multi-chip scaling via jax.sharding meshes.

The reference is single-GPU (SURVEY.md §2.3: its GPU0/1/2 macros and
``device_num`` plumbing are dead code — ``cudaSetDevice(0)`` always). The
TPU-native scaling axis is the *optimization window*: mapping runs
``numIters`` Adam steps over ~20 keyframes, and batching those keyframe
renders across chips is both the MXU-saturation lever and the natural
data-parallel dimension (BASELINE.json north star; SURVEY.md §5).

Design:
- the Gaussian map (params + Adam moments) is REPLICATED across the mesh,
- window frames (images, depths, poses, tile bins) are SHARDED over the
  ``view`` axis,
- each device renders its frame shard and computes local gradients,
- one ``psum`` over ICI averages gradients; the Adam update is computed
  identically on every chip, keeping replicas bit-identical with zero
  parameter traffic.

This is the "batched window" mode: one step optimizes against n_dev frames
simultaneously (large-batch flavor of the reference's one-random-frame-per-
iteration loop). Single-chip parity mode stays in ``slam/mapping.py``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import MappingConfig
from gsorb_slam_tpu.raster.binning import TileBins
from gsorb_slam_tpu.raster.preprocess import preprocess
from gsorb_slam_tpu.raster.tiled import render_binned
from gsorb_slam_tpu.raster.types import RasterConfig
from gsorb_slam_tpu.slam.mapping import WindowFrames, _mapping_loss
from gsorb_slam_tpu.splat.gaussians import GaussianMap, adam_step, map_learning_rates

VIEW_AXIS = "view"


def make_mesh(n_devices: int | None = None, axis: str = VIEW_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np_array(devs[:n]), (axis,))


def np_array(devs):
    import numpy as np

    return np.array(devs)


def replicate_map(gm: GaussianMap, mesh: Mesh) -> GaussianMap:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(gm, sharding)


def shard_frames(frames: WindowFrames, mesh: Mesh) -> WindowFrames:
    """Shard the leading (view) dim across the mesh. The view count must be
    divisible by the mesh size (pad with repeated frames if needed)."""
    sh = NamedSharding(mesh, P(VIEW_AXIS))
    return WindowFrames(
        colors=jax.device_put(frames.colors, sh),
        depths=jax.device_put(frames.depths, sh),
        poses=jax.device_put(frames.poses, sh),
        bins_indices=jax.device_put(frames.bins_indices, sh),
        bins_counts=jax.device_put(frames.bins_counts, sh),
        n_frames=jax.device_put(frames.n_frames, NamedSharding(mesh, P())),
    )


def parallel_window_step(
    gm: GaussianMap,
    frames: WindowFrames,
    mesh: Mesh,
    cam: Camera,
    mcfg: MappingConfig,
    rcfg: RasterConfig,
    local_idx: jnp.ndarray | int = 0,
) -> tuple[GaussianMap, jnp.ndarray]:
    """ONE data-parallel mapping Adam step: each chip renders the
    ``local_idx``-th frame of ITS shard (callers rotate ``local_idx`` over
    iterations so all window frames participate).

    Returns (updated replicated map, scalar mean loss). Call under jit; the
    body runs in ``shard_map`` so each chip renders only its local frame
    and the only collective is the gradient ``psum`` riding ICI.
    """
    lrs = map_learning_rates(mcfg)
    n_dev = mesh.shape[VIEW_AXIS]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            (P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS)),
            P(),
        ),
        out_specs=(P(), P()),
        # The blend scan's carry is initialized from replicated constants;
        # the varying-manual-axes checker would demand explicit pvary on
        # every init. The psum at the end restores replication regardless.
        check_vma=False,
    )
    def local_grads(gm_rep, frame_shard, idx):
        colors, depths, poses, b_idx, b_cnt = frame_shard
        k = jnp.asarray(idx, jnp.int32) % colors.shape[0]
        pick = lambda a: jax.lax.dynamic_index_in_dim(a, k, keepdims=False)

        def loss_fn(params):
            g2 = dataclasses.replace(gm_rep, **params)
            prep = preprocess(
                g2.means, g2.rgb, g2.quats, g2.logit_opacities, g2.log_scales,
                g2.active, pick(poses), cam, mcfg.scale_modifier,
            )
            bins = TileBins(
                indices=pick(b_idx), counts=pick(b_cnt),
                n_dropped=jnp.zeros((), jnp.int32),
            )
            out = render_binned(prep, bins, cam, rcfg, bg=mcfg.background_color)
            return _mapping_loss(g2, out, pick(colors), pick(depths), mcfg, False)

        loss, grads = jax.value_and_grad(loss_fn)(gm_rep.params())
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, VIEW_AXIS) / n_dev, grads
        )
        loss = jax.lax.psum(loss, VIEW_AXIS) / n_dev
        return grads, loss

    frame_tuple = (
        frames.colors, frames.depths, frames.poses,
        frames.bins_indices, frames.bins_counts,
    )
    grads, loss = local_grads(gm, frame_tuple, jnp.asarray(local_idx, jnp.int32))
    gm = adam_step(gm, grads, lrs)
    return gm, loss
