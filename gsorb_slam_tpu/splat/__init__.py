from gsorb_slam_tpu.splat.gaussians import (
    GaussianMap,
    PoseState,
    add_points,
    adam_step,
    compact,
    empty_map,
    init_pose_state,
    pose_adam_step,
    prune_low_opacity,
    single_pixel_log_scale,
)

__all__ = [
    "GaussianMap",
    "PoseState",
    "add_points",
    "adam_step",
    "compact",
    "empty_map",
    "init_pose_state",
    "pose_adam_step",
    "prune_low_opacity",
    "single_pixel_log_scale",
]
