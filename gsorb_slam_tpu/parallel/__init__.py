from gsorb_slam_tpu.parallel.mesh import (
    make_mesh,
    parallel_window_step,
    replicate_map,
)
from gsorb_slam_tpu.parallel.tracking import parallel_track_frame

__all__ = [
    "make_mesh",
    "parallel_window_step",
    "parallel_track_frame",
    "replicate_map",
]
