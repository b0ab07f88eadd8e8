from gsorb_slam_tpu.slam import dataset, mapping, system, tracking, window

__all__ = ["dataset", "mapping", "system", "tracking", "window"]
