"""Reference-format YAML config loading."""

from gsorb_slam_tpu.core.config import SystemConfig, load_config


def test_load_tum_yaml():
    cfg = load_config("configs/tum1.yaml")
    assert cfg.dataset.type == "tum"
    assert cfg.camera.width == 640 and cfg.camera.height == 480
    assert abs(cfg.camera.fx - 517.306408) < 1e-6
    assert cfg.camera.depth_map_factor == 5000.0
    assert cfg.camera.bf == 40.0  # flat legacy key "Camera.bf"
    assert cfg.orb.n_features == 1000 and cfg.orb.n_levels == 8
    assert cfg.mapping.num_iters == 100
    assert cfg.mapping.lam == 0.8
    assert cfg.mapping.madien_mul == 10.0
    assert cfg.mapping.init_scalar_method == 2
    assert cfg.tracking.num_iters == 200
    assert cfg.tracking.use_sur_depth is True
    assert cfg.debug.use_loop is True
    assert cfg.eval.save_root_path == "experiments"


def test_load_replica_yaml_deltas():
    cfg = load_config("configs/replica.yaml")
    assert cfg.mapping.num_iters == 60  # Replica: 60 mapping iters
    assert cfg.tracking.num_iters == 40  # Replica: 40 tracking iters
    assert cfg.mapping.madien_mul == 40.0
    assert cfg.camera.depth_map_factor == 6553.5


def test_config_is_hashable_static_arg():
    cfg = load_config("configs/tum1.yaml")
    assert isinstance(hash(cfg), int)
    assert cfg == load_config("configs/tum1.yaml")


def test_defaults_without_file():
    cfg = SystemConfig()
    assert cfg.mapping.prune_opacities == 0.005
    assert cfg.tracking.overlap_threshold == 0.87
