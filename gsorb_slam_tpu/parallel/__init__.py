from gsorb_slam_tpu.parallel.mesh import (
    make_mesh,
    parallel_window_step,
    replicate_map,
)

__all__ = ["make_mesh", "parallel_window_step", "replicate_map"]
