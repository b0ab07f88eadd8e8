from gsorb_slam_tpu.core import camera, config, transforms

__all__ = ["camera", "config", "transforms"]
