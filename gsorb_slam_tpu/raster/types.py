"""Shared rasterizer types."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer knobs (jit-hashable).

    The reference fixes BLOCK 16x16 and NUM_CHANNELS 3
    (``cuda_rasterizer/config.h:15-17``); on TPU the tile is a VPU/MXU
    work-shape choice and the per-tile instance capacity replaces the
    dynamic per-tile ranges of the CUDA radix-sort pipeline.
    """

    tile: int = dataclasses.field(default=16, metadata=dict(static=True))
    # Tile HEIGHT in pixels (0 = square, i.e. `tile`). The CUDA block is
    # fixed 16x16; on TPU the dominant cost is the [chunk, px] slab
    # elementwise work (px = tile * tile_h), so for scenes of small splats
    # a half-height tile (tile_h=8, px=128) cuts per-instance element work
    # ~2x while raising duplication only ~1.25x — net ~1.6x less slab work
    # (PLAN.md round-4 roadmap item 4).
    tile_h: int = dataclasses.field(default=0, metadata=dict(static=True))
    # Max sorted instances blended per tile. CUDA has no cap (dynamic
    # ranges); we truncate the *farthest* instances past this, which only
    # drops content already occluded in practice.
    tile_capacity: int = dataclasses.field(default=1024, metadata=dict(static=True))
    # Tile capacity for the TRACKING path only (0 = tile_capacity). The
    # tracking pack/preprocess run DENSE over capacity (cap columns per
    # tile every iteration), so tracking pays for capacity whether tiles
    # are full or not — while its loss is masked to alpha>0.99 pixels
    # where near content dominates, making far-occluded truncation nearly
    # harmless (r1-r3 tracked at 1024 with 1.2-1.4 cm ATE). Mapping/eval
    # renders, whose supervision IS harmed by truncation (r4: depth-L1
    # 0.31 -> 0.088 m at 2048), use the full tile_capacity.
    track_tile_capacity: int = dataclasses.field(default=0, metadata=dict(static=True))
    # Max tiles a single Gaussian may be duplicated into (static instance
    # count M = C * max_dup). Rects larger than this are clamped around the
    # projected center.
    max_dup: int = dataclasses.field(default=16, metadata=dict(static=True))
    # Chunk of instances blended per scan step inside a tile.
    chunk: int = dataclasses.field(default=128, metadata=dict(static=True))
    # Extra pixels added to each Gaussian's tile rect so cached bins stay
    # valid while pose/means drift between re-binning episodes.
    dilate_px: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    # Blend backend: "auto" = Pallas kernels on TPU, XLA elsewhere;
    # "pallas" / "xla" force one.
    backend: str = dataclasses.field(default="auto", metadata=dict(static=True))
    # Early-stop semantics. True = CUDA-exact (the instance whose blend
    # would cross T<1e-4 is NOT applied; needs a cumulative-max pass per
    # chunk). False = fast mode: instances apply while their incoming
    # transmittance is >= 1e-4 (the crossing instance IS applied). Outputs
    # differ by <= 1e-4 in color/alpha — far below photometric noise.
    exact_stop: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # Chunk steps per while-loop iteration in the Pallas blend kernels.
    # The ~340ns fixed loop overhead dominates the per-chunk math, so the
    # inner steps are Python-unrolled; early exit happens at super-chunk
    # (chunk * chunk_unroll instances) granularity.
    chunk_unroll: int = dataclasses.field(default=4, metadata=dict(static=True))
    # bf16 MXU inputs (f32 accumulation) for the triangular transmittance
    # cumsum matmuls; ~1e-3 relative T error, below sensor noise.
    blend_bf16: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # bf16 ELEMENTWISE slab math in the non-exact (fast) blend paths: the
    # [chunk, px] alpha/transmittance/weight chain runs on packed bf16
    # (2 values per f32 lane slot on the VPU) with f32 MXU accumulation and
    # an f32 transmittance carry between chunks. ~0.4% relative error in
    # per-element weights -> <1% in pose/map gradients (sums over 1e5-1e8
    # contributions); gated compiled-vs-XLA by scripts/tpu_smoke.py.
    # Implies the blend_bf16 matmul mode on the fast paths (the cumsum
    # operand is already bf16).
    elem_bf16: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Static chunk budget for the flat-chunk mapping path (ChunkBins):
    # supports up to chunk_budget * chunk live tile-instances per view.
    # HBM note: the grouped flat kernels size three [chunk_budget, 8, px]
    # f32 buffers (forward snapshots + the backward's pre-gathered
    # cotangent/final-T) by this budget — ~67 MB each at 8192/px=256 — so
    # mapping-path HBM footprint/traffic scales with chunk_budget, not with
    # the live tile count. Watch headroom before raising it for denser
    # scenes.
    chunk_budget: int = dataclasses.field(default=8192, metadata=dict(static=True))
    # Chunks processed per grid step in the FLAT blend kernels (the mapping
    # path): amortizes the fixed per-grid-step cost the same way
    # fused_tiles_per_step does for tracking. The chunk budget is padded to
    # a multiple of this; per-tile state still flows through scratch, and
    # the per-tile outputs become a last-chunk-snapshot gather in XLA.
    flat_group: int = dataclasses.field(default=4, metadata=dict(static=True))
    # Tiles processed per grid step in the fused tracking kernel (fast
    # path): amortizes the ~1.3us fixed per-grid-step cost. The tile count
    # is padded to a multiple of this.
    fused_tiles_per_step: int = dataclasses.field(default=4, metadata=dict(static=True))
    # Paired-rect TRACKING kernel (raster/paired.py): bin with 16x8 rect
    # tiles (set tile_h=8) and blend two vertically-adjacent tiles per
    # 256-lane slab — per-instance element work halves at unchanged Mosaic
    # shapes. Consulted ONLY by the tracking fast path (track_frame);
    # mapping/eval renders ignore it. Requires exact_stop=False and an even
    # rect-tile row count (any height multiple of 16).
    paired: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Chunk K for the TRACKING view only (0 = rcfg.chunk). The paired
    # kernel's sweet spot is K=128 (finer quantization of per-pair trip
    # counts) while the mapping flat kernels keep 256.
    track_chunk: int = dataclasses.field(default=0, metadata=dict(static=True))
    # Chunks whose K-linear math is batched into one [cbatch*K, px] slab
    # per super-step in the fused fast tracking kernel (1 = off). The
    # measured ~0.8us/chunk floor is matmul-issue overhead, not FLOPs —
    # batching grows/phi/Srows/WG/accum amortizes it; the K^2 cumsum and
    # suffix matmuls stay per chunk. Early exit coarsens to cbatch
    # granularity, so keep cbatch <= the typical live chunk count.
    fused_chunk_batch: int = dataclasses.field(default=1, metadata=dict(static=True))
    # Mapping-path pack backward via per-episode sorted segment reduction
    # instead of XLA's scatter-add transpose (flat_pack_grad_aux): the
    # argsort is amortized per binning episode; every Adam iteration's
    # backward replaces a random-index scatter-add with gather+segsum.
    sorted_pack_grad: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # Pair rect tiles by DESCENDING COUNT (argsort per binning episode)
    # instead of static vertical neighbors: minimizes sum(max(cA, cB)) —
    # the paired kernel's chunk-trip count — and pairs empty tiles
    # together. False = the original vertical-neighbor pairing.
    paired_sort: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # Run the per-iteration instance EWA projection through the Pallas
    # kernel pair (raster/preprocess_pallas.py) on the tracking fast path:
    # ~3x cheaper than the XLA chain (intermediate materialization). Off =
    # the XLA preprocess_instances path.
    preprocess_pallas: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # Diagnostic mode for the fused tracking kernel: write per-tile internal
    # sums (mask count, S stats, executed chunks, gt-block read checksums)
    # into the spare lanes of the loss output rows, for compiled-vs-XLA
    # triage of Mosaic lowering divergences (e.g. the rect16x8 px=128 hunt).
    # Never set in production paths.
    debug_loss: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def tile_w_px(self) -> int:
        """Tile width in pixels (the lane-major axis of the pixel basis)."""
        return self.tile

    @property
    def tile_h_px(self) -> int:
        """Tile height in pixels (0 config value = square)."""
        return self.tile_h or self.tile


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderOutput:
    """Everything the reference needs from its TWO rasterizations, in one.

    The reference renders RGB (-> color, median ``out_depth``, radii) and
    then again with ``colors_precomp=[z,1,0]`` (-> alpha-blended depth in
    ch0, accumulated opacity in ch1) (``GSParamDepthUpdata``
    ``src/Render.cc:894-981``). One TPU pass emits all of it.
    """

    color: jnp.ndarray  # [H, W, 3] = sum c a T + T_final * bg
    depth: jnp.ndarray  # [H, W] alpha-blended z (differentiable)
    alpha: jnp.ndarray  # [H, W] accumulated opacity = sum a T
    median_depth: jnp.ndarray  # [H, W] z of last contributor with T>0.5
    #   (stop-gradient: the CUDA binding drops out_depth's gradient,
    #    include/Rasterizer.cuh:209-212)
    final_t: jnp.ndarray  # [H, W] remaining transmittance
    radii: jnp.ndarray  # [C] per-Gaussian pixel radius (0 = culled)
