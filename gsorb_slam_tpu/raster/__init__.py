from gsorb_slam_tpu.raster.types import RasterConfig, RenderOutput
from gsorb_slam_tpu.raster.preprocess import Preprocessed, preprocess
from gsorb_slam_tpu.raster.naive import render_naive
from gsorb_slam_tpu.raster.binning import TileBins, bin_gaussians
from gsorb_slam_tpu.raster.tiled import render_binned, render_tiled, render

__all__ = [
    "RasterConfig",
    "RenderOutput",
    "Preprocessed",
    "preprocess",
    "render_naive",
    "TileBins",
    "bin_gaussians",
    "render_binned",
    "render_tiled",
    "render",
]
