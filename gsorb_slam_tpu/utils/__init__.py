from gsorb_slam_tpu.utils import drawing

__all__ = ["drawing"]
