"""System facade: the per-frame SLAM orchestration.

TPU-native equivalent of ``System``/``Tracking::TrackWithGaussian``
(``src/System.cc:34-229``, ``src/Tracking.cc:293-451``): per frame —

1. motion-model pose prediction,
2. tracking-by-rendering (``slam/tracking.py``),
3. keyframe decision via the novel-view-overlap criterion,
4. densification at the tracked pose (``slam/mapping.py``),
5. optimization-window assembly (``slam/window.py``) and ``numIters``
   mapping Adam steps.

Where the reference interleaves this across 4 mutex-synchronized CPU threads
with the GPU work inlined in the Tracking thread (SURVEY.md §1), here the
device work is three jitted programs (track / densify / map-window) driven
by a single-owner host loop; keyframe images and cached tile bins live in
fixed device pools so window assembly is a device-side gather, not a
host->device upload.

Sort amortization policy (see ``raster/binning.py``): bins are built once
per frame at the tracked pose (shared by tracking+densify) and once after
densification (the window's current-frame bins, which must see the new
splats); cached keyframe bins refresh round-robin when older than
``bins_ttl`` frames. Pruning is mask-only so cached bins stay valid;
compaction (which permutes splat indices) runs only near capacity and
invalidates every cached bin.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import SystemConfig, load_config
from gsorb_slam_tpu.raster.binning import TileBins, bin_gaussians
from gsorb_slam_tpu.raster.preprocess import preprocess
from gsorb_slam_tpu.raster.tiled import render_binned
from gsorb_slam_tpu.raster.types import RasterConfig
from gsorb_slam_tpu.slam import mapping as M
from gsorb_slam_tpu.slam import tracking as T
from gsorb_slam_tpu.slam import window as W
from gsorb_slam_tpu.splat.gaussians import GaussianMap, compact, empty_map

SENSOR_RGBD = "rgbd"
SENSOR_MONOCULAR = "monocular"
SENSOR_STEREO = "stereo"

# Process-wide XLA compile-time accumulator (trace + lowering + backend
# compile), fed by jax's monitoring events. First-call compiles land inside
# whatever wall-clock phase triggered them; this counter lets
# shutdown_summary report them as their OWN field (``compile_s``) so
# steady-state claims reconcile against result.txt (r4 verdict item 7:
# total_frontend_s carried ~380 s of compile the phase timers could not
# explain).
_COMPILE_SECONDS = {"total": 0.0}
_COMPILE_EVENTS = (
    "/jax/core/compile/jaxpr_trace_duration",
    "/jax/core/compile/jaxpr_to_mlir_module_duration",
    "/jax/core/compile/backend_compile_duration",
)
_compile_listener_registered = False


def _register_compile_listener() -> None:
    global _compile_listener_registered
    if _compile_listener_registered:
        return
    try:
        from jax._src import monitoring

        def _on_event(name: str, dur: float, **_kw) -> None:
            if name in _COMPILE_EVENTS:
                _COMPILE_SECONDS["total"] += dur

        monitoring.register_event_duration_secs_listener(_on_event)
        _compile_listener_registered = True
    except Exception:  # monitoring API moved — degrade to no compile field
        pass


@dataclasses.dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    T_cw: np.ndarray
    is_keyframe: bool
    track_loss: float
    track_iters: int


@dataclasses.dataclass
class _ForcedTrackResult:
    """Stand-in track result when a pose is injected (``gt_pose``)."""

    T_cw: np.ndarray
    loss: float = 0.0
    n_iters: int = 0


class System:
    """Drop-in analog of the reference ``System`` facade for RGB-D.

    The ORB geometric front-end attaches via ``frontend`` (feature matches
    feed the tracking chi^2 term); without it the tracker runs pure
    rendering-based refinement from the motion model — the reference's own
    fallback when ORB fails (``src/Tracking.cc:339-350``).
    """

    @staticmethod
    def default_raster_config(width: int = 320) -> RasterConfig:
        """The production raster configuration (single source of truth for
        apps/benchmarks that want to tweak one field of it).

        ``dilate_px`` scales with resolution: the same physical inter-rebin
        pose drift is twice the PIXELS at VGA as at QVGA, and a dilate that
        undershoots the drift starves the pose gradient of the true-surface
        tiles (the r2 VGA tracking collapse — see PLAN.md drift experiment:
        dilate 4 + rebins 8/40/120 leaves 2.4% residual where dilate 2 +
        one rebin stalls at ~50%). QVGA keeps dilate 2 (~45% fewer tile
        instances than dilate 4).

        ``tile_capacity`` 2048: at SLAM map densities (250-400k splats at
        QVGA) a 1024 cap truncated ~50% of binned instances
        (bin_dropped_frac telemetry, r4), and because mapping TRAINS on
        those truncated renders the map geometry itself went bad — the
        r4 cap-2048 twin cut depth-L1 0.31 -> 0.088 m and raised PSNR
        ~6 dB (experiments/r4b_cap2048). Cost: 2x bin/pack memory; blend
        time scales with LIVE instances, not capacity.

        ``blend_bf16`` ON: the r4 full-budget quality twin
        (experiments/r4b_cap2048 f32 vs r4b_bf16full bf16, identical
        otherwise) shows bf16 >= f32 on every metric (ATE 3.98 vs
        4.54 cm, PSNR 23.20 vs 23.24 dB, depth-L1 0.086 vs 0.088 m) at
        -23% fused-kernel time (r3 ablation); pose-grad accuracy gated
        compiled-vs-XLA every smoke run.

        ``chunk=256`` (B=2, U=2): best measured fused-kernel config on the
        VGA sweep (7.47 vs 8.08 ms/iter at K=128 B=4 U=4 —
        scripts/profile_fused.py, r4c).

        ``elem_bf16`` ON: bf16 slab SCRATCH halves the phase-A->B VMEM
        traffic of the fused kernel — bench 143.3 vs 122.6 it/s (r4g,
        math_ok). Quality twin at QVGA full budget is within noise of f32
        (ATE 1.69 vs 1.57 cm, PSNR 26.01 vs 26.02, depth-L1 0.0439 vs
        0.0433 — experiments/r4g_qvga_elem16 vs tum_like_qvga_r4c); pose
        grads gated compiled-vs-XLA (rel ~1.2e-2) every smoke run. (The
        fixed-2-chunk ablation shows the slab-math-only cost slightly
        above blend_bf16 — the win is the scratch traffic, which that
        ablation's f32-scratch local kernel cannot see.)"""
        return RasterConfig(
            # track_tile_capacity 512 + fused B=4 (r5 sweep): the tracking
            # pack/preprocess are DENSE over capacity, so halving the cap
            # halves their cost; B=4 amortizes the per-grid-step fixed
            # cost. 143.5 -> 159.0 it/s at the bench workload (max
            # per-tile count there is 472; real-scene truncation is
            # monitored by bin_dropped_frac and tolerated on the tracking
            # path — drops are the farthest instances).
            tile=16, tile_capacity=2048, track_tile_capacity=512,
            max_dup=16, chunk=256, chunk_unroll=2, fused_tiles_per_step=4,
            dilate_px=2.0 if width <= 400 else 4.0,
            exact_stop=False,
            blend_bf16=True,
            elem_bf16=True,
        )

    def __init__(
        self,
        config: SystemConfig | str | dict,
        max_keyframes: int = 128,
        raster: Optional[RasterConfig] = None,
        bins_ttl: int = 10,
        bins_refresh_per_frame: int = 3,
        seed: int = 0,
        frontend: str = "render",  # "render" | "orb"
        vocabulary=None,  # frontend.vocab.Vocabulary for loop closing
        mono_min_matches: int = 60,
        mono_min_inliers: int = 50,
        use_mesh: bool = False,  # data-parallel window mapping over devices
    ):
        self.mono_min_matches = mono_min_matches
        self.mono_min_inliers = mono_min_inliers
        self.cfg = config if isinstance(config, SystemConfig) else load_config(config)
        cc = self.cfg.camera
        self.cam = Camera(
            fx=cc.fx, fy=cc.fy, cx=cc.cx, cy=cc.cy, width=cc.width, height=cc.height
        )
        self.frontend_mode = frontend
        self.fe = None
        self.loop_closer = None
        if frontend == "orb":
            from gsorb_slam_tpu.core.camera import Distortion
            from gsorb_slam_tpu.slam.geometric import GeometricFrontend

            self.fe = GeometricFrontend(
                self.cam,
                self.cfg.orb,
                th_depth=cc.bf / cc.fx * cc.th_depth,
                seed=seed,
                dist=Distortion(
                    k1=cc.k1, k2=cc.k2, p1=cc.p1, p2=cc.p2, k3=cc.k3
                ),
                bf=cc.bf,
            )
            if vocabulary is None and self.cfg.debug.use_loop:
                # System::System loads the packaged ORB vocabulary at
                # startup (src/System.cc:86-96); ours ships a synthetic-
                # domain artifact (assets/ORBvoc_synth.txt).
                from gsorb_slam_tpu.frontend.vocab import default_vocabulary

                vocabulary = default_vocabulary()
            if vocabulary is not None and self.cfg.debug.use_loop:
                from gsorb_slam_tpu.slam.loop import LoopCloser

                self.loop_closer = LoopCloser(vocabulary)
        # exact_stop=False: production default — the early-stop deviation is
        # <= 1e-4 in color/alpha (far below sensor noise) and saves ~8%/iter;
        # pass a RasterConfig with exact_stop=True for CUDA-bit semantics.
        # dilate_px resolution-scaled (see default_raster_config). chunk=128:
        # the triangular cumsum/suffix matmuls cost O(K) per pixel-instance
        # pair, so at true-f32 precision K=128 halves the dominant FLOPs vs
        # 256 (measured 10.6 vs 19.5 ms/iter).
        self.rcfg = raster or System.default_raster_config(self.cam.width)
        self.gm: GaussianMap = empty_map(self.cfg.mapping.max_gaussians)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

        self.max_keyframes = max_keyframes
        self.bins_ttl = bins_ttl
        self.bins_refresh_per_frame = bins_refresh_per_frame

        # Device keyframe pools (uint8 colors to quarter the footprint).
        H, Wd = self.cam.height, self.cam.width
        ty = -(-H // self.rcfg.tile_h_px)
        tx = -(-Wd // self.rcfg.tile_w_px)
        n_tiles = ty * tx
        cap = self.rcfg.tile_capacity
        self._kf_colors = jnp.zeros((max_keyframes, H, Wd, 3), jnp.uint8)
        self._kf_depths = jnp.zeros((max_keyframes, H, Wd), jnp.float32)
        self._kf_bins_idx = jnp.full((max_keyframes, n_tiles, cap), -1, jnp.int32)
        self._kf_bins_cnt = jnp.zeros((max_keyframes, n_tiles), jnp.int32)

        self.keyframes: list[W.KeyFrameMeta] = []
        self.last_kf: Optional[W.KeyFrameMeta] = None  # most recent KF meta
        self._kf_created = 0  # monotonic count of keyframes ever created
        self._last_compact_frame = -1
        # Last frame where add_points RECYCLED dead slots below the
        # high-water mark: bins cached BEFORE that frame may index a
        # recycled row at the dead splat's tiles (live when built, pruned,
        # re-filled) and would blend the new splat into wrong tiles —
        # treated like compaction in _refresh_kf_bins (ADVICE r4: the TTL
        # window left this unguarded for up to bins_ttl frames).
        self._last_recycle_frame = -1
        self.trajectory: list[FrameRecord] = []
        self.frame_id = 0
        self.last_kf_frame_id = -(10**9)
        self.velocity = np.eye(4, dtype=np.float32)  # T_cur_prev motion model
        self.last_T_cw = np.eye(4, dtype=np.float32)
        self.max_frames_between_kf = int(self.cfg.camera.fps)

        self.timings = {
            "track": 0.0, "map": 0.0, "n_track": 0, "n_map": 0,
            # Host-side phases the r2 e2e runs left unattributed (VGA spent
            # ~13 s/frame OUTSIDE track/map): ORB frontend per frame, and
            # the keyframe chain (create_keyframe + LocalMapping + loop).
            "frontend": 0.0, "kf": 0.0, "n_kf": 0,
        }
        # XLA compile seconds attributable to THIS System's lifetime
        # (process-wide counter snapshot; see _COMPILE_SECONDS).
        _register_compile_listener()
        self._compile_s_at_init = _COMPILE_SECONDS["total"]
        self.loop_events: list[tuple[int, int, int]] = []
        self.densify_added: list[int] = []  # per-frame splat add counts
        # (kept, dropped) instance counts per binning episode (device
        # scalars; see _bin_auto).
        self._bin_stats: list[tuple] = []

        # Multi-device window mapping (SURVEY.md §2.3 obligation): map
        # replicated, window views sharded, gradient psum over ICI. Batched-
        # window semantics: each Adam step consumes ALL window frames at
        # once (vs the reference's one-random-frame-per-iteration,
        # src/Render.cc:420-483) — a large-batch variant, n_dev gradient
        # samples per step.
        self.mesh = None
        if use_mesh and len(jax.devices()) > 1:
            from gsorb_slam_tpu.parallel import mesh as PM

            self.mesh = PM.make_mesh()
            self._mesh_mod = PM
            mcfg, rcfg_ = self.cfg.mapping, self.rcfg
            cam_ = self.cam

            @jax.jit
            def _mesh_step(gm, frames, local_idx):
                return PM.parallel_window_step(
                    gm, frames, self.mesh, cam_, mcfg, rcfg_,
                    local_idx=local_idx,
                )

            self._mesh_step = _mesh_step

        self._build_jits()

    def _map_window_mesh(self, frames: "M.WindowFrames", n_iters: int):
        """Data-parallel mapping: pad the window to a mesh multiple and run
        ``n_iters`` batched steps (one gradient psum per step)."""
        PM = self._mesh_mod
        n_dev = self.mesh.shape[PM.VIEW_AXIS]
        W = int(frames.colors.shape[0])
        pad = (-W) % n_dev
        if pad:
            tile_first = lambda a: jnp.concatenate(
                [a, jnp.repeat(a[:1], pad, axis=0)], axis=0
            )
            frames = M.WindowFrames(
                colors=tile_first(frames.colors),
                depths=tile_first(frames.depths),
                poses=tile_first(frames.poses),
                bins_indices=tile_first(frames.bins_indices),
                bins_counts=tile_first(frames.bins_counts),
                n_frames=frames.n_frames,
            )
        gm = PM.replicate_map(self.gm, self.mesh)
        frames = PM.shard_frames(frames, self.mesh)
        losses = []
        for it in range(n_iters):
            gm, loss = self._mesh_step(gm, frames, jnp.asarray(it, jnp.int32))
            losses.append(loss)
        self.gm = gm
        return jnp.stack(losses)

    # ------------------------------------------------------------------ jits

    def _build_jits(self):
        cam, rcfg, mcfg, tcfg = self.cam, self.rcfg, self.cfg.mapping, self.cfg.tracking
        # Tracking-only raster view: smaller tile capacity (see
        # RasterConfig.track_tile_capacity) — the tracking pack/preprocess
        # are dense over capacity, mapping/eval renders are not.
        rcfg_t = rcfg
        if (
            getattr(rcfg, "track_tile_capacity", 0)
            and rcfg.track_tile_capacity != rcfg.tile_capacity
        ):
            rcfg_t = dataclasses.replace(
                rcfg_t, tile_capacity=rcfg.track_tile_capacity
            )
        if getattr(rcfg, "track_chunk", 0):
            rcfg_t = dataclasses.replace(rcfg_t, chunk=rcfg.track_chunk)
        if getattr(rcfg, "paired", False):
            # Paired-rect tracking (raster/paired.py): the TRACKING view
            # bins with 16x8 rect tiles; mapping/eval keep the square grid
            # (rcfg.tile_h). The mesh tracking path shards square tiles —
            # strip paired there (see the mesh branch below).
            rcfg_t = dataclasses.replace(rcfg_t, tile_h=rcfg.tile // 2)
            if self.mesh is not None:
                rcfg_t = dataclasses.replace(
                    rcfg_t, paired=False, tile_h=rcfg.tile_h
                )

        from gsorb_slam_tpu.splat.gaussians import prefix_view

        def _prefix_bucket(gm) -> int:
            """Power-of-two bucket over the live prefix: render-path work
            (sort, pack) scales with this, not the safety capacity.

            ``self.prefix_bucket_floor`` raises the smallest bucket: every
            bucket crossing recompiles the whole render-path program set
            (minutes each through a remote-compile tunnel), so a run that
            KNOWS it will reach N splats should floor the bucket there and
            pay one compile generation instead of several."""
            n = int(gm.count)
            b = max(1 << 14, int(getattr(self, "prefix_bucket_floor", 0)))
            while b < n:
                b *= 2
            return min(b, gm.capacity)

        self._prefix_bucket = _prefix_bucket

        def _bin(gm: GaussianMap, T_cw, prefix: int):
            gm = prefix_view(gm, prefix)
            prep = preprocess(
                gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
                gm.active, T_cw, cam, mcfg.scale_modifier,
            )
            return bin_gaussians(prep, cam, rcfg)

        _bin_inner = jax.jit(_bin, static_argnames=("prefix",))

        def _bin_auto(gm, T_cw):
            b = _bin_inner(gm, T_cw, _prefix_bucket(gm))
            # tile_capacity truncation telemetry (VERDICT r3 item 7): every
            # binning episode records (instances kept, instances dropped past
            # the per-tile capacity) as device scalars; summed at shutdown.
            self._bin_stats.append((jnp.sum(b.counts), b.n_dropped))
            return b

        if rcfg_t is not rcfg:

            def _bin_track(gm: GaussianMap, T_cw, prefix: int):
                gm = prefix_view(gm, prefix)
                prep = preprocess(
                    gm.means, gm.rgb, gm.quats, gm.logit_opacities,
                    gm.log_scales, gm.active, T_cw, cam, mcfg.scale_modifier,
                )
                return bin_gaussians(prep, cam, rcfg_t)

            _bin_track_inner = jax.jit(_bin_track, static_argnames=("prefix",))

            def _bin_track_auto(gm, T_cw):
                # Tracking bins intentionally truncate harder (see
                # track_tile_capacity) — excluded from the mapping/eval
                # truncation telemetry.
                return _bin_track_inner(gm, T_cw, _prefix_bucket(gm))

        else:
            _bin_track_auto = _bin_auto
        self._bin_track_jit = _bin_track_auto

        def _render(gm: GaussianMap, T_cw, bins: TileBins, prefix: int):
            gm = prefix_view(gm, prefix)
            prep = preprocess(
                gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
                gm.active, T_cw, cam, mcfg.scale_modifier,
            )
            return render_binned(prep, bins, cam, rcfg, bg=mcfg.background_color)

        _render_inner = jax.jit(_render, static_argnames=("prefix",))

        def _render_auto(gm, T_cw, bins):
            return _render_inner(gm, T_cw, bins, _prefix_bucket(gm))

        if self.mesh is not None:
            # Tile-sharded tracking over the mesh (parallel/tracking.py):
            # instance pack + gt tiles sharded by tile strip, one 7-dof
            # pose-gradient psum per iteration. Bins are rebuilt inside
            # (the sharded pack must be laid out per segment anyway).
            from gsorb_slam_tpu.parallel.tracking import parallel_track_frame

            mesh_ = self.mesh

            def _track(gm, T_init, color, depth, matches, bins, n_iters,
                       prefix):
                del bins
                gm = prefix_view(gm, prefix)
                return parallel_track_frame(
                    gm, T_init, color, depth, matches, cam, tcfg, rcfg_t,
                    mesh_, num_iters=n_iters,
                    scale_modifier=mcfg.scale_modifier,
                )
        else:

            def _track(gm, T_init, color, depth, matches, bins, n_iters,
                       prefix):
                gm = prefix_view(gm, prefix)
                return T.track_frame(
                    gm, T_init, color, depth, matches, cam, tcfg, rcfg_t,
                    num_iters=n_iters, bins=bins,
                    scale_modifier=mcfg.scale_modifier,
                )

        _track_inner = jax.jit(_track, static_argnames=("n_iters", "prefix"))

        def _track_auto(gm, T_init, color, depth, matches, bins, n_iters):
            return _track_inner(
                gm, T_init, color, depth, matches, bins, n_iters,
                _prefix_bucket(gm),
            )

        self._track_jit = _track_auto

        @jax.jit
        def _densify(gm, out, color, depth, T_cw, sat_tiles):
            return M.densify_frame(
                gm, out, color, depth, T_cw, cam, mcfg,
                sat_tiles=sat_tiles, rcfg=rcfg,
            )

        self._densify_jit = _densify

        from gsorb_slam_tpu.splat.gaussians import prefix_writeback

        def _map(gm, frames, key, n_iters, init_mode, chunk_budget, prefix):
            gm_p = prefix_view(gm, prefix)
            gm_p, losses = M.map_window(
                gm_p, frames, key, cam, mcfg, rcfg,
                num_iters=n_iters, init_mode=init_mode,
                chunk_budget=chunk_budget,
            )
            return prefix_writeback(gm, gm_p), losses

        _map_inner = jax.jit(
            _map,
            static_argnames=("n_iters", "init_mode", "chunk_budget", "prefix"),
        )

        def _map_auto(gm, frames, key, n_iters, init_mode, chunk_budget):
            return _map_inner(
                gm, frames, key, n_iters, init_mode, chunk_budget,
                _prefix_bucket(gm),
            )

        self._map_jit = _map_auto

        def _window_chunk_budget(frames) -> int:
            """Power-of-two bucket just above the window's max live chunk
            count: dead budget chunks cost full kernel grid steps."""
            K = rcfg.chunk
            nch = int(
                jnp.max(
                    jnp.sum((frames.bins_counts + K - 1) // K, axis=1)
                )
            )
            # quantize to 1024-chunk steps: coarse enough to reuse compiled
            # executables across frames, fine enough that dead budget
            # chunks stay a small fraction of the live count
            b = max(-(-(nch + 64) // 1024) * 1024, 1024)
            return min(b, 1 << 15)

        self._window_chunk_budget = _window_chunk_budget

        @jax.jit
        def _gather_window(
            kf_colors, kf_depths, kf_bins_idx, kf_bins_cnt, kf_poses, ids,
            cur_color, cur_depth, cur_pose, cur_bins_idx, cur_bins_cnt, n_frames,
        ):
            colors = jnp.concatenate(
                [cur_color[None], kf_colors[ids].astype(jnp.float32) / 255.0]
            )
            depths = jnp.concatenate([cur_depth[None], kf_depths[ids]])
            poses = jnp.concatenate([cur_pose[None], kf_poses])
            bi = jnp.concatenate([cur_bins_idx[None], kf_bins_idx[ids]])
            bc = jnp.concatenate([cur_bins_cnt[None], kf_bins_cnt[ids]])
            return M.WindowFrames(
                colors=colors, depths=depths, poses=poses,
                bins_indices=bi, bins_counts=bc, n_frames=n_frames,
            )

        self._bin_jit = _bin_auto
        self._render_jit = _render_auto
        self._gather_window_jit = _gather_window

    # ------------------------------------------------------------- keyframes

    def _create_keyframe(
        self, color, depth, T_cw: np.ndarray, fe_kf_id: int = -1
    ) -> W.KeyFrameMeta:
        kf_id = self._kf_created
        if kf_id >= self.max_keyframes:
            # Pool full: round-robin over the non-anchor slots, driven by the
            # MONOTONIC creation counter (len(self.keyframes) saturates at
            # max_keyframes, which would pin recycling to one slot forever).
            kf_id = 4 + ((self._kf_created - self.max_keyframes) % (self.max_keyframes - 4))
        self._kf_created += 1
        ref_pts = W.sample_reference_points(
            np.asarray(depth), self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            n_points=self.cfg.tracking.n_ref_points, rng=self.rng,
        )
        meta = W.KeyFrameMeta(
            kf_id=kf_id,
            frame_id=self.frame_id,
            T_cw=np.asarray(T_cw, np.float32),
            ref_points_cam=ref_pts,
            fe_kf_id=fe_kf_id,
        )
        color_u8 = jnp.asarray(
            np.clip(np.asarray(color) * 255.0, 0, 255).astype(np.uint8)
        )
        self._kf_colors = self._kf_colors.at[kf_id].set(color_u8)
        self._kf_depths = self._kf_depths.at[kf_id].set(jnp.asarray(depth))
        if kf_id < len(self.keyframes):
            self.keyframes[kf_id] = meta
        else:
            self.keyframes.append(meta)
        self.last_kf = meta
        self.last_kf_frame_id = self.frame_id
        return meta

    def _refresh_kf_bins(self, kf_ids: list[int]) -> None:
        """Rebuild stale cached bins.

        Two classes: bins INVALIDATED by a compaction/loop correction
        (their gaussian indices address permuted rows — consuming them
        corrupts the window gradients) are rebuilt unconditionally; bins
        merely OLDER than ``bins_ttl`` refresh round-robin, capped at
        ``bins_refresh_per_frame`` per frame.
        """
        stale_event = max(self._last_compact_frame, self._last_recycle_frame)
        invalid = [
            i for i in kf_ids
            if self.keyframes[i].bins_built_at <= stale_event
        ]
        stale = [
            i for i in kf_ids
            if i not in set(invalid)
            and self.frame_id - self.keyframes[i].bins_built_at > self.bins_ttl
        ]
        stale.sort(key=lambda i: self.keyframes[i].bins_built_at)
        for i in invalid + stale[: self.bins_refresh_per_frame]:
            kf = self.keyframes[i]
            bins = self._bin_jit(self.gm, jnp.asarray(kf.T_cw))
            self._kf_bins_idx = self._kf_bins_idx.at[i].set(bins.indices)
            self._kf_bins_cnt = self._kf_bins_cnt.at[i].set(bins.counts)
            kf.bins_built_at = self.frame_id

    def _invalidate_all_bins(self) -> None:
        for kf in self.keyframes:
            kf.bins_built_at = -(10**9)

    # --------------------------------------------------------- orb frontend

    def _sync_frontend_poses(self) -> None:
        """Propagate BA-refined keyframe poses from the geometric front-end
        into the rendering-side keyframe metas (the shared-Map coupling:
        Render's window selection reads BA'd poses, src/Render.cc:353-367).

        Metas link to front-end keyframes via ``fe_kf_id`` — pool slot ids
        recycle after ``max_keyframes`` while front-end ids grow monotonically,
        so positional indexing would silently mis-pair after the pool wraps.
        """
        if self.fe is None:
            return
        adjusted = set(getattr(self.fe, "last_adjusted", []) or [])
        by_fe_id = {fe_kf.kf_id: fe_kf for fe_kf in self.fe.keyframes}
        for meta in self.keyframes:
            fe_kf = by_fe_id.get(meta.fe_kf_id)
            if fe_kf is None:
                continue
            meta.T_cw = np.asarray(fe_kf.T_cw, np.float32)
            if fe_kf.kf_id in adjusted:
                meta.rendered_num += 1

    def _maybe_close_loop(self, fe_kf) -> None:
        """LoopClosing::Run equivalent, invoked per keyframe (src/LoopClosing.cc)."""
        lc = self.loop_closer
        if lc is None or self.fe is None:
            return
        lc.add_keyframe(fe_kf)
        recent = {
            kf.kf_id
            for kf in self.fe.keyframes
            if fe_kf.kf_id - kf.kf_id < lc.min_gap
        }
        cand = lc.detect(fe_kf, recent)
        if cand is None:
            return
        # kf_id lookup, NOT a list index: keyframe culling leaves holes.
        match_kf = next(
            (kf for kf in self.fe.keyframes if kf.kf_id == cand), None
        )
        if match_kf is None:
            return
        T_corr = lc.verify(fe_kf, match_kf, self.fe, cam=self.cam)
        if T_corr is None:
            return
        covis = [
            (fe_kf.kf_id, other_id, float(w))
            for other_id, w in self.fe.covisibility(fe_kf)[:10]
        ]
        corrected, point_corr = lc.correct(
            self.fe.keyframes, fe_kf.kf_id, cand, T_corr, covis
        )
        for kf in self.fe.keyframes:
            kf.T_cw = corrected[kf.kf_id]
        if point_corr is not None:
            # 7-DoF (monocular) closure: remap map points through their
            # reference keyframe's old->new world Sim3 so the scale
            # correction reaches the structure, not just the poses
            # (LoopClosing::CorrectLoop, src/LoopClosing.cc:470-500).
            fe = self.fe
            ids = np.nonzero(fe.pt_valid)[0]
            for p in ids:
                corr_mat = point_corr.get(int(fe.pt_first_kf[p]))
                if corr_mat is not None:
                    fe.pt_pos[p] = (
                        corr_mat[:3, :3] @ fe.pt_pos[p] + corr_mat[:3, 3]
                    )
        # Post-correction completion (src/LoopClosing.cc:405-660):
        # SearchAndFuse — project map points into the corrected query KF and
        # its covisible neighbors and merge duplicates (:590) — then a
        # global BA over all keyframes+points (RunGlobalBundleAdjustment
        # :648 -> Optimizer::GlobalBundleAdjustemnt src/Optimizer.cc:41).
        by_id = {kf.kf_id: kf for kf in self.fe.keyframes}
        fuse_targets = [fe_kf.kf_id, cand] + [cid for _q, cid, _w in covis]
        for kid in dict.fromkeys(fuse_targets):
            kf = by_id.get(kid)
            if kf is not None:
                self.fe.fuse_duplicates(kf)
        adjusted = self.fe.global_ba()
        self.fe.last_adjusted = adjusted
        self._sync_frontend_poses()
        self._invalidate_all_bins()
        lc.last_closed_kf = fe_kf.kf_id
        self.loop_events.append((self.frame_id, fe_kf.kf_id, cand))

    # ----------------------------------------------------------------- track

    def track_rgbd(
        self,
        rgb: np.ndarray,
        depth: np.ndarray,
        timestamp: float = 0.0,
        matches: Optional[T.FeatureMatches] = None,
        stereo_aux: Optional[dict] = None,  # from track_stereo: feats/kp_ur/kp_depth
        gt_pose: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Process one RGB-D frame; returns the estimated T_cw [4,4].

        The reference entry point chain ``System::TrackRGBD`` ->
        ``Tracking::GrabImageRGBD`` -> ``TrackWithGaussian``
        (``src/System.cc:229``, ``src/Tracking.cc:250-451``).

        ``gt_pose`` (debug/eval harnesses only): skip pose optimization and
        run keyframing/densify/mapping at the given T_cw — isolates mapping
        quality from tracking error.
        """
        rgb_np = np.asarray(rgb, np.float32)
        depth_np = np.asarray(depth, np.float32)
        color = jnp.asarray(rgb_np)
        d = jnp.asarray(depth_np)
        match_cap = self.fe.match_capacity if self.fe is not None else 8
        matches = matches if matches is not None else T.FeatureMatches.empty(match_cap)

        fe_res = None
        aux = stereo_aux or {}
        t_fe = time.perf_counter()
        if self.fe is not None:
            gray = (
                0.299 * rgb_np[..., 0] + 0.587 * rgb_np[..., 1] + 0.114 * rgb_np[..., 2]
            ).astype(np.float32)
            if self.frame_id == 0:
                feats0 = aux.get("feats")
                if feats0 is None:
                    feats0 = self.fe._extract(jnp.asarray(gray))
                T0 = (
                    np.eye(4, dtype=np.float32)
                    if gt_pose is None
                    else np.asarray(gt_pose, np.float32)
                )
                # Frame-0 keyframe creation belongs to the KF-chain timer
                # (where every later create_keyframe lands) — it triggers
                # the whole LocalMapping compile generation, which used to
                # land in total_frontend_s (r4 verdict item 7).
                self.timings["frontend"] += time.perf_counter() - t_fe
                t_kf0 = time.perf_counter()
                kf0 = self.fe.create_keyframe(
                    feats0, depth_np, T0, frame_id=0,
                    kp_depth=aux.get("kp_depth"),
                )
                # The first keyframe must enter the loop/reloc BoW database
                # too (System.cc:86-96 loads the vocabulary before ANY
                # keyframe; KeyFrameDatabase::add runs for every KF).
                if self.loop_closer is not None:
                    self.loop_closer.add_keyframe(kf0)
                self.timings["kf"] += time.perf_counter() - t_kf0
                self.timings["n_kf"] += 1
                t_fe = time.perf_counter()
            else:
                T_pred = (self.velocity @ self.last_T_cw).astype(np.float32)
                fe_res = self.fe.process_frame(
                    gray, T_pred, feats=aux.get("feats"), kp_ur=aux.get("kp_ur")
                )

        self.timings["frontend"] += time.perf_counter() - t_fe

        if self.frame_id == 0:
            T_cw = np.eye(4, dtype=np.float32) if gt_pose is None else np.asarray(
                gt_pose, np.float32
            )
            self._initialize(
                color, d, T_cw, fe_kf_id=0 if self.fe is not None else -1
            )
        else:
            T_cw = self._track_and_map(
                color, d, matches, fe_res, depth_np, kp_depth=aux.get("kp_depth"),
                forced_pose=gt_pose,
            )

        self.last_T_cw = T_cw
        rec = self.trajectory[-1]
        rec.timestamp = timestamp
        self.frame_id += 1
        return T_cw

    def _initialize(self, color, depth, T_cw: np.ndarray, fe_kf_id: int = -1):
        """Frame 0: dense seed + warm-up (``StereoInitialization`` ->
        ``Render::InitWorld``, ``src/Tracking.cc:741-830``)."""
        t0 = time.perf_counter()
        self.gm = M.seed_from_frame(
            self.gm, color, depth, jnp.asarray(T_cw), self.cam, self.cfg.mapping
        )
        bins = self._bin_jit(self.gm, jnp.asarray(T_cw))
        frames = M.WindowFrames(
            colors=color[None],
            depths=depth[None],
            poses=jnp.asarray(T_cw)[None],
            bins_indices=bins.indices[None],
            bins_counts=bins.counts[None],
            n_frames=jnp.asarray(1, jnp.int32),
        )
        self.key, sub = jax.random.split(self.key)
        self.gm, _ = self._map_jit(
            self.gm, frames, sub,
            n_iters=self.cfg.mapping.init_iters, init_mode=True,
            chunk_budget=self._window_chunk_budget(frames),
        )
        self._create_keyframe(color, depth, T_cw, fe_kf_id=fe_kf_id)
        self._refresh_kf_bins([self.last_kf.kf_id])
        self.timings["map"] += time.perf_counter() - t0
        self.timings["n_map"] += 1
        self.trajectory.append(
            FrameRecord(self.frame_id, 0.0, T_cw, True, 0.0, 0)
        )

    def _track_and_map(
        self, color, depth, matches, fe_res=None, depth_np=None, kp_depth=None,
        forced_pose=None,
    ) -> np.ndarray:
        cfg = self.cfg
        # Motion model (Tracking::TrackWithMotionModel seed), replaced by the
        # ORB-optimized pose when the geometric front-end succeeded
        # (TrackWithMotionModel -> TrackLocalMapWithGaussian chain,
        # src/Tracking.cc:330-353).
        T_init = (self.velocity @ self.last_T_cw).astype(np.float32)
        n_track_iters = cfg.tracking.num_iters
        if fe_res is not None:
            if fe_res.T_orb is not None:
                T_init = fe_res.T_orb.astype(np.float32)
                matches = fe_res.matches
                self._lost_streak = 0
            else:
                # ORB lost: GS tracker takes over with the lost-mode budget
                # (src/Tracking.cc:339-350); after a persistent loss, try
                # DBoW-free relocalization (Tracking::Relocalization analog).
                n_track_iters = cfg.tracking.lost_num_iters
                self._lost_streak = getattr(self, "_lost_streak", 0) + 1
                if self._lost_streak >= 3 and self.fe is not None:
                    T_reloc = self.fe.relocalize(
                        fe_res.feats,
                        kfdb=self.loop_closer.db if self.loop_closer else None,
                    )
                    if T_reloc is not None:
                        T_init = T_reloc.astype(np.float32)
                        self.velocity = np.eye(4, dtype=np.float32)
                        self._lost_streak = 0

        t0 = time.perf_counter()
        if forced_pose is not None:
            # Debug/eval pose injection: skip the render-based pose refine.
            T_cw = np.asarray(forced_pose, np.float32)
            bins = self._bin_jit(self.gm, jnp.asarray(T_cw))
            res = _ForcedTrackResult(T_cw=T_cw)
        else:
            bins = self._bin_track_jit(self.gm, jnp.asarray(T_init))
            res = self._track_jit(
                self.gm, jnp.asarray(T_init), color, depth, matches, bins,
                n_iters=n_track_iters,
            )
            T_cw = np.asarray(res.T_cw)
        if not np.isfinite(T_cw).all():
            # Tracking-diverged tripwire (the reference's lost-tracking /
            # auto-reset analog, src/Tracking.cc:699-707): fall back to the
            # motion-model prediction rather than poisoning the trajectory.
            T_cw = np.asarray(T_init, np.float32)
        self.timings["track"] += time.perf_counter() - t0
        self.timings["n_track"] += 1
        self.velocity = (T_cw @ np.linalg.inv(self.last_T_cw)).astype(np.float32)

        # Keyframe decision: novel-view overlap OR max-gap OR weak ORB
        # tracking (the c1c/c2 inlier gates, simplified). Zero inliers is the
        # WEAKEST tracking, so the gate is n_inliers < 40 — not 0 < n < 40.
        ref_kf = self.last_kf
        is_kf = False
        if ref_kf is not None:
            novel = W.need_new_keyframe_visual(
                ref_kf, T_cw, self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                self.cam.width, self.cam.height, cfg.tracking.overlap_threshold,
            )
            weak_orb = fe_res is not None and fe_res.n_inliers < 40
            is_kf = novel or weak_orb or (
                self.frame_id - self.last_kf_frame_id >= self.max_frames_between_kf
            )
        if is_kf:
            t_kf = time.perf_counter()
            fe_kf = None
            if self.fe is not None and fe_res is not None:
                fe_kf = self.fe.create_keyframe(
                    fe_res.feats, depth_np, T_cw, self.frame_id,
                    kp_depth=kp_depth,
                )
            self._create_keyframe(
                color, depth, T_cw,
                fe_kf_id=fe_kf.kf_id if fe_kf is not None else -1,
            )
            if fe_kf is not None:
                self._sync_frontend_poses()
                self._maybe_close_loop(fe_kf)
            self.timings["kf"] += time.perf_counter() - t_kf
            self.timings["n_kf"] += 1

        t0 = time.perf_counter()
        # Periodic prune (mask-only: cached bins stay valid). Near capacity
        # the cadence tightens to EVERY frame and a budget prune cuts the
        # weakest splats so add_points always finds recyclable rows
        # (VERDICT r3 item 4: a saturated map must keep accepting splats).
        near_cap = int(self.gm.n_active()) > 0.85 * self.gm.capacity
        if self.frame_id % cfg.mapping.prune_every == 0 or near_cap:
            self.gm = M.prune_map(self.gm, cfg.mapping)
            if near_cap:
                from gsorb_slam_tpu.splat.gaussians import prune_to_budget

                self.gm = prune_to_budget(self.gm, target_frac=0.8)
                self.timings["n_budget_prune"] = (
                    self.timings.get("n_budget_prune", 0) + 1
                )
        # Near-capacity compaction permutes splat rows: every cached bin AND
        # the bins built above at T_init are stale afterwards — rebuild
        # before any further render (ADVICE r1: stale bins corrupted the
        # densify mask and window gradients whenever compaction fired).
        if int(self.gm.count) > 0.9 * self.gm.capacity:
            self.gm = compact(self.gm)
            self._invalidate_all_bins()
            self._last_compact_frame = self.frame_id

        # Render at the tracked pose for densification with FRESH full-
        # capacity bins: tracking bins are (a) built at T_init, (b) capped
        # at track_tile_capacity — reusing them feeds a truncated render
        # into the add-mask. Saturated tiles are additionally excluded from
        # densify (densify_frame docstring).
        bins = self._bin_jit(self.gm, jnp.asarray(T_cw))
        out = self._render_jit(self.gm, jnp.asarray(T_cw), bins)
        # Dead slots below the high-water mark BEFORE densify: any adds
        # now will fill them first (add_points recycling order), which
        # staleness-invalidates older cached bins (see _last_recycle_frame).
        dead_below_hwm = int(self.gm.count) - int(self.gm.n_active())
        self.gm, _n_added = self._densify_jit(
            self.gm, out, color, depth, jnp.asarray(T_cw),
            bins.counts >= self.rcfg.tile_capacity,
        )
        if dead_below_hwm > 0 and int(_n_added) > 0:
            self._last_recycle_frame = self.frame_id
        # Per-frame add-count instrumentation (r2 verdict: find densify
        # divergence empirically, not by eye).
        self.densify_added.append(int(_n_added))

        # Window selection + mapping.
        sel = W.select_window(
            self.keyframes, ref_kf, self.frame_id,
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            self.cam.width, self.cam.height, self.rng,
            n_covis=cfg.mapping.covis_window,
            n_random_fill=cfg.mapping.window_size - cfg.mapping.covis_window,
            n_recent_ba=cfg.mapping.recent_ba_window,
            n_anchor=cfg.mapping.anchor_frames,
        )
        win_ids = sel.kf_ids[: cfg.mapping.window_size - 1]
        self._refresh_kf_bins(win_ids)

        # Fresh bins at the tracked pose AFTER densify: the window's
        # current-frame entry must see the newly added splats.
        cur_bins = self._bin_jit(self.gm, jnp.asarray(T_cw))
        ids = jnp.asarray(
            np.pad(win_ids, (0, max(0, (cfg.mapping.window_size - 1) - len(win_ids))),
                   constant_values=0),
            jnp.int32,
        )
        kf_poses = jnp.asarray(
            np.stack(
                [self.keyframes[i].T_cw for i in win_ids]
                + [np.eye(4, dtype=np.float32)]
                * max(0, (cfg.mapping.window_size - 1) - len(win_ids))
            )
        )
        frames = self._gather_window_jit(
            self._kf_colors, self._kf_depths, self._kf_bins_idx, self._kf_bins_cnt,
            kf_poses, ids, color, depth, jnp.asarray(T_cw),
            cur_bins.indices, cur_bins.counts,
            jnp.asarray(1 + len(win_ids), jnp.int32),
        )
        if self.mesh is not None:
            _losses = self._map_window_mesh(frames, cfg.mapping.num_iters)
        else:
            self.key, sub = jax.random.split(self.key)
            self.gm, _losses = self._map_jit(
                self.gm, frames, sub, n_iters=cfg.mapping.num_iters,
                init_mode=False,
                chunk_budget=self._window_chunk_budget(frames),
            )
        self.timings["map"] += time.perf_counter() - t0
        self.timings["n_map"] += 1

        self.trajectory.append(
            FrameRecord(
                self.frame_id, 0.0, T_cw, is_kf,
                float(res.loss), int(res.n_iters),
            )
        )
        return T_cw

    # ------------------------------------------------------- other sensors

    def track_stereo(
        self, left: np.ndarray, right: np.ndarray, timestamp: float = 0.0
    ) -> np.ndarray:
        """Stereo entry point (``System::TrackStereo``).

        Geometric depth comes from ORB descriptor matching along rectified
        rows — ``Frame::ComputeStereoMatches`` (``src/Frame.cc``) — feeding
        per-keypoint depths into map-point creation and (u, v, uR) stereo
        edges into pose optimization (``src/Optimizer.cc:300-380``). Dense
        SGBM depth remains the densification/mapping source (the reference's
        stereo path never enters TrackWithGaussian; dense depth lets the GS
        back-end run for stereo too)."""
        import cv2

        lg8 = (np.asarray(left, np.float32) * 255).astype(np.uint8)
        rg8 = (np.asarray(right, np.float32) * 255).astype(np.uint8)
        if lg8.ndim == 3:
            lg8 = cv2.cvtColor(lg8, cv2.COLOR_RGB2GRAY)
            rg8 = cv2.cvtColor(rg8, cv2.COLOR_RGB2GRAY)
        # Disparity range adapted to the image width (96 for VGA-class
        # inputs; SGBM requires width - numDisparities > blockSize/2).
        num_disp = max(16, min(96, ((lg8.shape[1] // 3) // 16) * 16))
        sgbm = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=num_disp, blockSize=7,
            P1=8 * 49, P2=32 * 49, uniquenessRatio=10,
        )
        disp = sgbm.compute(lg8, rg8).astype(np.float32) / 16.0
        bf = self.cfg.camera.bf
        depth = np.where(disp > 0.5, bf / np.maximum(disp, 0.5), 0.0)
        rgb = left if np.asarray(left).ndim == 3 else np.repeat(
            np.asarray(left)[..., None], 3, axis=-1
        )

        stereo_aux = None
        if self.fe is not None and bf > 0:
            from gsorb_slam_tpu.frontend.matcher import compute_stereo_matches
            from gsorb_slam_tpu.frontend.orb import level_sigma2

            gl = lg8.astype(np.float32) / 255.0
            gr = rg8.astype(np.float32) / 255.0
            feats_l = self.fe._extract(jnp.asarray(gl))
            feats_r = self.fe._extract(jnp.asarray(gr))
            scale_factors = jnp.asarray(
                np.sqrt(level_sigma2(self.cfg.orb)), jnp.float32
            )
            sm = compute_stereo_matches(
                feats_l, feats_r, bf, min_z=0.3, scale_factors=scale_factors
            )
            stereo_aux = dict(
                feats=feats_l,
                kp_ur=np.where(
                    np.asarray(sm.valid), np.asarray(sm.u_right), -1.0
                ).astype(np.float32),
                kp_depth=np.asarray(sm.depth, np.float32),
            )
        return self.track_rgbd(rgb, depth, timestamp, stereo_aux=stereo_aux)

    def track_monocular(
        self, rgb: np.ndarray, timestamp: float = 0.0
    ) -> Optional[np.ndarray]:
        """Monocular entry point (``System::TrackMonocular``). Bootstrap via
        the H/F-RANSAC initializer, then ORB tracking with GS mapping from
        triangulated points. Matches the reference's monocular scope: its
        mono path never enters ``TrackWithGaussian`` — classic geometric
        tracking with the splat map built from sparse structure
        (``src/Tracking.cc:244,832-1009``; SURVEY.md §7 monocular note).
        Returns None until initialization succeeds."""
        if self.fe is None:
            raise RuntimeError("monocular tracking requires frontend='orb'")
        import jax.numpy as jnp2

        from gsorb_slam_tpu.frontend.initializer import initialize_monocular
        from gsorb_slam_tpu.frontend.matcher import match_descriptors

        rgb_np = np.asarray(rgb, np.float32)
        gray = (
            0.299 * rgb_np[..., 0] + 0.587 * rgb_np[..., 1] + 0.114 * rgb_np[..., 2]
        ).astype(np.float32)
        feats = self.fe._extract(jnp.asarray(gray))

        if not hasattr(self, "_mono_ref"):
            self._mono_ref = None
            self._mono_initialized = False
            self._mono_state = "NOT_INITIALIZED"
            self._mono_lost = 0
            self._mono_last_kf_frame = -(10**9)
            if self.loop_closer is not None:
                # mbFixScale is sensor-dependent (src/LoopClosing.cc:234):
                # monocular loops solve the 7th (scale) DoF.
                self.loop_closer.fix_scale = False

        if not self._mono_initialized:
            if self._mono_ref is None:
                self._mono_ref = (feats, rgb_np)
                self.frame_id += 1
                return None
            ref_feats, ref_rgb = self._mono_ref
            m = match_descriptors(ref_feats, feats)
            mv = np.asarray(m.valid)
            if mv.sum() < self.mono_min_matches:
                self._mono_ref = (feats, rgb_np)
                self.frame_id += 1
                return None
            uv1 = np.asarray(ref_feats.uv)[mv]
            uv2 = np.asarray(feats.uv)[np.asarray(m.idx2)[mv]]
            res = initialize_monocular(
                uv1, uv2, np.asarray(self.cam.K),
                min_inliers=self.mono_min_inliers,
            )
            if res is None:
                self.frame_id += 1
                return None
            # Seed the geometric map with the triangulated structure and the
            # splat map with the sparse colored points.
            good = res.inliers
            pts = res.points[good]
            cols = ref_rgb[
                np.clip(uv1[good, 1].astype(int), 0, ref_rgb.shape[0] - 1),
                np.clip(uv1[good, 0].astype(int), 0, ref_rgb.shape[1] - 1),
            ]
            n = len(pts)
            p0 = self.fe.n_points
            take = min(n, len(self.fe.pt_pos) - p0)
            self.fe.pt_pos[p0 : p0 + take] = pts[:take]
            self.fe.pt_desc[p0 : p0 + take] = np.asarray(ref_feats.descriptors)[mv][
                good
            ][:take]
            self.fe.pt_valid[p0 : p0 + take] = True
            self.fe.pt_visible[p0 : p0 + take] = 2
            self.fe.pt_found[p0 : p0 + take] = 2
            self.fe.n_points += take
            from gsorb_slam_tpu.splat.gaussians import add_points as _add

            self.gm = _add(
                self.gm, jnp2.asarray(pts[:take]), jnp2.asarray(cols[:take]),
                jnp2.asarray(pts[:take, 2]),
                jnp2.ones(take, bool), self.cam.fx, self.cam.fy,
            )
            self._mono_initialized = True
            self._mono_state = "OK"
            self.last_T_cw = res.T_cw2.astype(np.float32)
            # Two bootstrap keyframes anchor the spanning tree and give
            # triangulation/reloc a reference (CreateInitialMapMonocular,
            # src/Tracking.cc:891-1009).
            zero_depth = np.zeros_like(gray)
            self.fe.create_keyframe(
                ref_feats, zero_depth, np.eye(4, dtype=np.float32),
                self.frame_id - 1, run_local_mapping=False,
            )
            kf2 = self.fe.create_keyframe(
                feats, zero_depth, self.last_T_cw, self.frame_id,
                run_local_mapping=False,
            )
            # attach triangulated points to the second keyframe's keypoints
            kp2 = np.asarray(m.idx2)[mv][good][:take]
            kf2.point_ids[kp2] = np.arange(p0, p0 + take)
            kf1 = self.fe.keyframes[-2]
            kp1 = np.nonzero(mv)[0][good][:take]
            kf1.point_ids[kp1] = np.arange(p0, p0 + take)
            for p in range(p0, p0 + take):
                self.fe._observe_kf(p, kf1.kf_id)
                self.fe._observe_kf(p, kf2.kf_id)
            if self.loop_closer is not None:
                self.loop_closer.add_keyframe(kf1)
                self.loop_closer.add_keyframe(kf2)
            self._mono_last_kf_frame = self.frame_id
            self.trajectory.append(
                FrameRecord(self.frame_id, timestamp, self.last_T_cw, True, 0.0, 0)
            )
            self.frame_id += 1
            return self.last_T_cw

        # Initialized: the classic Track() state machine (src/Tracking.cc:
        # 490-738): OK -> projection tracking; LOST -> relocalization
        # attempts; auto-Reset when lost with a young map (:699-707).
        T_pred = (self.velocity @ self.last_T_cw).astype(np.float32)
        fe_res = self.fe.process_frame(gray, T_pred, feats=feats)
        ok = fe_res.T_orb is not None and fe_res.n_inliers >= 10
        if ok:
            self._mono_state = "OK"
            self._mono_lost = 0
            T_cw = fe_res.T_orb
            # Keyframe policy: match decay or frame gap (NeedNewKeyFrame
            # mono gates, simplified) -> insert KF + triangulate new points.
            gap = self.frame_id - self._mono_last_kf_frame
            if gap >= 5 or fe_res.n_inliers < 40:
                kf = self.fe.create_keyframe(
                    feats, np.zeros_like(gray), T_cw, self.frame_id,
                    run_local_mapping=True,
                )
                self._mono_last_kf_frame = self.frame_id
                if self.loop_closer is not None:
                    self.loop_closer.add_keyframe(kf)
        else:
            self._mono_state = "LOST"
            self._mono_lost += 1
            T_reloc = self.fe.relocalize(
                feats,
                kfdb=self.loop_closer.db if self.loop_closer else None,
            )
            if T_reloc is not None:
                T_cw = np.asarray(T_reloc, np.float32)
                self._mono_state = "OK"
                self._mono_lost = 0
                self.velocity = np.eye(4, dtype=np.float32)
            else:
                # Auto-Reset: lost soon after init with a tiny map
                # (src/Tracking.cc:699-707).
                if len(self.fe.keyframes) <= 5 and self._mono_lost >= 3:
                    self._mono_reset()
                    self.frame_id += 1
                    return None
                T_cw = T_pred  # coast on the motion model
        self.velocity = (T_cw @ np.linalg.inv(self.last_T_cw)).astype(np.float32)
        self.last_T_cw = T_cw
        self.trajectory.append(
            FrameRecord(self.frame_id, timestamp, T_cw, False, 0.0, fe_res.n_inliers)
        )
        self.frame_id += 1
        return T_cw

    def reset(self) -> None:
        """``System::Reset`` (``src/System.cc``; ``Tracking::Reset``
        ``src/Tracking.cc``): drop the Gaussian map, keyframes, map points,
        loop database, trajectory, and motion model. Camera, config, and the
        compiled program set survive — the next ``track_*`` call starts a
        fresh session without re-paying compilation."""
        self.gm = empty_map(self.cfg.mapping.max_gaussians)
        self._kf_colors = jnp.zeros_like(self._kf_colors)
        self._kf_depths = jnp.zeros_like(self._kf_depths)
        self._kf_bins_idx = jnp.full_like(self._kf_bins_idx, -1)
        self._kf_bins_cnt = jnp.zeros_like(self._kf_bins_cnt)
        self.keyframes = []
        self.last_kf = None
        self._kf_created = 0
        self._last_compact_frame = -1
        self._last_recycle_frame = -1
        self.trajectory = []
        self.frame_id = 0
        self.last_kf_frame_id = -(10**9)
        self.velocity = np.eye(4, dtype=np.float32)
        self.last_T_cw = np.eye(4, dtype=np.float32)
        self._lost_streak = 0
        self.loop_events = []
        self.densify_added = []
        self._bin_stats = []
        if self.fe is not None:
            from gsorb_slam_tpu.core.camera import Distortion
            from gsorb_slam_tpu.slam.geometric import GeometricFrontend

            cc = self.cfg.camera
            self.fe = GeometricFrontend(
                self.cam, self.cfg.orb,
                th_depth=cc.bf / cc.fx * cc.th_depth,
                dist=Distortion(k1=cc.k1, k2=cc.k2, p1=cc.p1, p2=cc.p2, k3=cc.k3),
                bf=cc.bf,
            )
        if self.loop_closer is not None:
            from gsorb_slam_tpu.slam.loop import LoopCloser

            self.loop_closer = LoopCloser(self.loop_closer.db.vocab)
        # monocular state machine (only present after track_monocular use)
        self._mono_ref = None
        self._mono_initialized = False
        self._mono_state = "NOT_INITIALIZED"
        self._mono_lost = 0
        self._mono_last_kf_frame = -(10**9)

    def _mono_reset(self) -> None:
        """System::Reset for the monocular path: drop the map and re-enter
        initialization (``src/Tracking.cc:699-707``, ``System::Reset``)."""
        from gsorb_slam_tpu.core.camera import Distortion
        from gsorb_slam_tpu.slam.geometric import GeometricFrontend

        cc = self.cfg.camera
        self.fe = GeometricFrontend(
            self.cam, self.cfg.orb,
            th_depth=cc.bf / cc.fx * cc.th_depth,
            dist=Distortion(k1=cc.k1, k2=cc.k2, p1=cc.p1, p2=cc.p2, k3=cc.k3),
            bf=cc.bf,
        )
        self.gm = empty_map(self.cfg.mapping.max_gaussians)
        if self.loop_closer is not None:
            from gsorb_slam_tpu.slam.loop import LoopCloser

            self.loop_closer = LoopCloser(self.loop_closer.db.vocab)
        self._mono_ref = None
        self._mono_initialized = False
        self._mono_state = "NOT_INITIALIZED"
        self._mono_lost = 0
        self.velocity = np.eye(4, dtype=np.float32)

    # ------------------------------------------------------------ checkpoint

    def save_checkpoint(self, path: str) -> None:
        """Full mid-run checkpoint: splat params + Adam state + keyframe
        graph + trajectory. The reference only has TODO stubs for this
        (``System::SaveMap/LoadMap``, ``include/System.h:131-133``); its only
        artifact is the terminal PLY. Here the PLY remains the interchange
        format (``eval/ply.py``) and this is the lossless resume format."""
        import os
        import pickle

        os.makedirs(path, exist_ok=True)
        gm = self.gm
        np.savez_compressed(
            os.path.join(path, "gaussians.npz"),
            means=np.asarray(gm.means),
            rgb=np.asarray(gm.rgb),
            quats=np.asarray(gm.quats),
            logit_opacities=np.asarray(gm.logit_opacities),
            log_scales=np.asarray(gm.log_scales),
            active=np.asarray(gm.active),
            count=np.asarray(gm.count),
            adam_t=np.asarray(gm.adam_t),
            scene_radius=np.asarray(gm.scene_radius),
            max_z=np.asarray(gm.max_z),
            **{f"m_{k}": np.asarray(v) for k, v in gm.adam_m.items()},
            **{f"v_{k}": np.asarray(v) for k, v in gm.adam_v.items()},
        )
        meta = {
            "frame_id": self.frame_id,
            "last_kf_frame_id": self.last_kf_frame_id,
            "velocity": self.velocity,
            "last_T_cw": self.last_T_cw,
            "kf_created": self._kf_created,
            "last_kf_id": self.last_kf.kf_id if self.last_kf is not None else -1,
            "loop_events": self.loop_events,
            "keyframes": [
                dict(
                    kf_id=kf.kf_id, frame_id=kf.frame_id, T_cw=kf.T_cw,
                    ref_points_cam=kf.ref_points_cam,
                    rendered_num=kf.rendered_num,
                    fe_kf_id=kf.fe_kf_id,
                )
                for kf in self.keyframes
            ],
            "frontend": self._frontend_state(),
            "trajectory": [
                dict(
                    frame_id=r.frame_id, timestamp=r.timestamp, T_cw=r.T_cw,
                    is_keyframe=r.is_keyframe, track_loss=r.track_loss,
                    track_iters=r.track_iters,
                )
                for r in self.trajectory
            ],
        }
        with open(os.path.join(path, "state.pkl"), "wb") as f:
            pickle.dump(meta, f)
        np.savez_compressed(
            os.path.join(path, "kf_pools.npz"),
            colors=np.asarray(self._kf_colors),
            depths=np.asarray(self._kf_depths),
        )

    def _frontend_state(self) -> Optional[dict]:
        """Serializable geometric-frontend + loop-closer state (an orb-mode
        resume without it silently continues with an empty geometric map —
        ADVICE r1)."""
        fe = self.fe
        if fe is None:
            return None
        n = fe.n_points
        feats_np = lambda f: {
            k: np.asarray(v) for k, v in f._asdict().items()
        }
        state = {
            "n_points": n,
            "pt_pos": fe.pt_pos[:n].copy(),
            "pt_desc": fe.pt_desc[:n].copy(),
            "pt_valid": fe.pt_valid[:n].copy(),
            "pt_visible": fe.pt_visible[:n].copy(),
            "pt_found": fe.pt_found[:n].copy(),
            "pt_first_kf": fe.pt_first_kf[:n].copy(),
            "kf_counter": fe.kf_counter,
            "keyframes": [
                dict(
                    kf_id=kf.kf_id, frame_id=kf.frame_id,
                    feats=feats_np(kf.feats),
                    point_ids=kf.point_ids.copy(), T_cw=kf.T_cw.copy(),
                )
                for kf in fe.keyframes
            ],
        }
        if self.loop_closer is not None:
            db = self.loop_closer.db
            state["loop_db"] = {
                "inverted": {w: sorted(s) for w, s in db.inverted.items()},
                "bows": db.bows,
                "consistency": self.loop_closer.consistency,
            }
        return state

    def _restore_frontend(self, state: Optional[dict]) -> None:
        from gsorb_slam_tpu.frontend.orb import ORBFeatures
        from gsorb_slam_tpu.slam.geometric import KeyFrameFeatures

        fe = self.fe
        if fe is None or state is None:
            return
        n = state["n_points"]
        fe.n_points = n
        for name in ("pt_pos", "pt_desc", "pt_valid", "pt_visible",
                     "pt_found", "pt_first_kf"):
            getattr(fe, name)[:n] = state[name]
        fe.kf_counter = state["kf_counter"]
        fe.keyframes = [
            KeyFrameFeatures(
                kf_id=d["kf_id"], frame_id=d["frame_id"],
                feats=ORBFeatures(
                    **{k: jnp.asarray(v) for k, v in d["feats"].items()}
                ),
                point_ids=d["point_ids"], T_cw=d["T_cw"],
            )
            for d in state["keyframes"]
        ]
        if self.loop_closer is not None and "loop_db" in state:
            db = self.loop_closer.db
            db.inverted = {
                w: set(s) for w, s in state["loop_db"]["inverted"].items()
            }
            db.bows = state["loop_db"]["bows"]
            self.loop_closer.consistency = state["loop_db"]["consistency"]

    def load_checkpoint(self, path: str) -> None:
        """Restore a :meth:`save_checkpoint` state and continue tracking."""
        import os
        import pickle

        z = np.load(os.path.join(path, "gaussians.npz"))
        names = ("means", "rgb", "quats", "logit_opacities", "log_scales")
        self.gm = dataclasses.replace(
            self.gm,
            **{k: jnp.asarray(z[k]) for k in names},
            active=jnp.asarray(z["active"]),
            count=jnp.asarray(z["count"]),
            adam_t=jnp.asarray(z["adam_t"]),
            scene_radius=jnp.asarray(z["scene_radius"]),
            max_z=jnp.asarray(z["max_z"]),
            adam_m={k: jnp.asarray(z[f"m_{k}"]) for k in names},
            adam_v={k: jnp.asarray(z[f"v_{k}"]) for k in names},
        )
        with open(os.path.join(path, "state.pkl"), "rb") as f:
            meta = pickle.load(f)
        self.frame_id = meta["frame_id"]
        self.last_kf_frame_id = meta["last_kf_frame_id"]
        self.velocity = meta["velocity"]
        self.last_T_cw = meta["last_T_cw"]
        self._kf_created = meta.get("kf_created", len(meta["keyframes"]))
        self.loop_events = meta.get("loop_events", [])
        self.keyframes = [
            W.KeyFrameMeta(
                kf_id=d["kf_id"], frame_id=d["frame_id"], T_cw=d["T_cw"],
                ref_points_cam=d["ref_points_cam"],
                rendered_num=d["rendered_num"],
                fe_kf_id=d.get("fe_kf_id", -1),
            )
            for d in meta["keyframes"]
        ]
        last_kf_id = meta.get("last_kf_id", -1)
        self.last_kf = (
            self.keyframes[last_kf_id]
            if 0 <= last_kf_id < len(self.keyframes)
            else (self.keyframes[-1] if self.keyframes else None)
        )
        self._restore_frontend(meta.get("frontend"))
        self.trajectory = [
            FrameRecord(
                frame_id=d["frame_id"], timestamp=d["timestamp"], T_cw=d["T_cw"],
                is_keyframe=d["is_keyframe"], track_loss=d["track_loss"],
                track_iters=d["track_iters"],
            )
            for d in meta["trajectory"]
        ]
        pools = np.load(os.path.join(path, "kf_pools.npz"))
        self._kf_colors = jnp.asarray(pools["colors"])
        self._kf_depths = jnp.asarray(pools["depths"])
        self._invalidate_all_bins()

    # ------------------------------------------------------------------ eval

    def get_trajectory(self) -> list[tuple[float, np.ndarray]]:
        return [(r.timestamp, r.T_cw) for r in self.trajectory]

    def render_view(self, T_cw: np.ndarray):
        """Render any pose (the ``Render::Viwer`` GUI hook,
        ``src/Render.cc:179-193``)."""
        bins = self._bin_jit(self.gm, jnp.asarray(T_cw))
        return self._render_jit(self.gm, jnp.asarray(T_cw), bins)

    # -------------------------------------------------------- observability

    def start_trace(self, log_dir: str) -> None:
        """Begin a device trace (``jax.profiler``) — the structured upgrade
        of the reference's chrono counters (``src/Render.cc:34-41``).
        View with TensorBoard/XProf."""
        jax.profiler.start_trace(log_dir)

    def stop_trace(self) -> None:
        jax.profiler.stop_trace()

    def shutdown_summary(self) -> dict:
        """Timing/stats contract of ``SavePlyAndPrintTime``
        (``src/Render.cc:167-174``)."""
        t = self.timings
        return {
            "total_gaussians": int(self.gm.n_active()),
            "avg_tracking_s": t["track"] / max(t["n_track"], 1),
            "avg_mapping_s": t["map"] / max(t["n_map"], 1),
            "total_tracking_s": t["track"],
            "total_mapping_s": t["map"],
            "total_frontend_s": t["frontend"],
            "total_kf_chain_s": t["kf"],
            # XLA compile seconds during this System's lifetime (trace +
            # lowering + backend compile, from jax monitoring events).
            # First-call compiles land inside whatever wall-clock phase
            # triggered them; subtract this to read steady state.
            "compile_s": round(
                _COMPILE_SECONDS["total"] - self._compile_s_at_init, 3
            ),
            "avg_kf_chain_s": t["kf"] / max(t["n_kf"], 1),
            "n_keyframes": len(self.keyframes),
            "n_frames": self.frame_id,
            "densify_added_mean": (
                float(np.mean(self.densify_added)) if self.densify_added else 0.0
            ),
            "densify_added_max": (
                int(np.max(self.densify_added)) if self.densify_added else 0
            ),
            "capacity_frac": float(int(self.gm.count) / self.gm.capacity),
            **self._bin_truncation_stats(),
            **(
                {f"phase_{k}": round(v, 3) for k, v in self.fe.timings.items()}
                if self.fe is not None
                else {}
            ),
        }

    def _bin_truncation_stats(self) -> dict:
        """tile_capacity truncation telemetry: fraction of tile-instances
        dropped past the per-tile capacity across every binning episode
        (the CUDA pipeline's dynamic ranges never drop;
        ``rasterizer_impl.cu:117-139``)."""
        if not self._bin_stats:
            return {"bin_instances_total": 0, "bin_dropped_total": 0,
                    "bin_dropped_frac": 0.0}
        kept = int(sum(int(k) for k, _ in self._bin_stats))
        dropped = int(sum(int(d) for _, d in self._bin_stats))
        return {
            "bin_instances_total": kept + dropped,
            "bin_dropped_total": dropped,
            "bin_dropped_frac": dropped / max(kept + dropped, 1),
        }
