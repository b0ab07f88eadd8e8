from gsorb_slam_tpu.eval import ate, ply, trajectory

__all__ = ["ate", "ply", "trajectory"]
