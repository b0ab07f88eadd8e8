from gsorb_slam_tpu.raster.types import RasterConfig, RenderOutput
from gsorb_slam_tpu.raster.preprocess import Preprocessed, preprocess
from gsorb_slam_tpu.raster.naive import render_naive
from gsorb_slam_tpu.raster.binning import ChunkBins, TileBins, bin_gaussians, chunk_layout
from gsorb_slam_tpu.raster.tiled import render_binned, render_tiled, render

__all__ = [
    "RasterConfig",
    "RenderOutput",
    "Preprocessed",
    "preprocess",
    "render_naive",
    "TileBins",
    "ChunkBins",
    "bin_gaussians",
    "chunk_layout",
    "render_binned",
    "render_tiled",
    "render",
]
