from gsorb_slam_tpu.frontend import ba, matcher, orb

__all__ = ["ba", "matcher", "orb"]
