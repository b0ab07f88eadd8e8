from gsorb_slam_tpu.eval import ate, evaluate, ply, trajectory

__all__ = ["ate", "evaluate", "ply", "trajectory"]
