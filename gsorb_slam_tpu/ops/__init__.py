from gsorb_slam_tpu.ops import losses, metrics

__all__ = ["losses", "metrics"]
