"""Synthetic scene helpers shared by rasterizer/SLAM tests."""

import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera


def tiny_camera(w=64, h=48, f=60.0):
    return Camera(fx=f, fy=f, cx=w / 2, cy=h / 2, width=w, height=h)


def random_cloud_scene(rng, n=256, capacity=None, depth_range=(1.5, 4.0), spread=1.2):
    """Random splats in front of the identity camera. Returns dict of padded
    param arrays + active mask."""
    capacity = capacity or n
    means = np.zeros((capacity, 3), np.float32)
    means[:n, 0] = rng.uniform(-spread, spread, n)
    means[:n, 1] = rng.uniform(-spread * 0.75, spread * 0.75, n)
    means[:n, 2] = rng.uniform(*depth_range, size=n)
    rgb = rng.uniform(0.05, 0.95, size=(capacity, 3)).astype(np.float32)
    quats = rng.normal(size=(capacity, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    logit_op = rng.uniform(0.5, 3.0, size=capacity).astype(np.float32)
    log_scales = np.log(rng.uniform(0.02, 0.1, size=(capacity, 3)).astype(np.float32))
    active = np.zeros(capacity, bool)
    active[:n] = True
    return dict(
        means=jnp.asarray(means),
        rgb=jnp.asarray(rgb),
        quats=jnp.asarray(quats),
        logit_opacities=jnp.asarray(logit_op),
        log_scales=jnp.asarray(log_scales),
        active=jnp.asarray(active),
    )


def identity_pose():
    return jnp.eye(4, dtype=jnp.float32)
