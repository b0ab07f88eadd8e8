import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsorb_slam_tpu.core import transforms as tf


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotmat_roundtrip(rng):
    q = random_quat(rng, (64,))
    R = tf.quat_to_rotmat(jnp.asarray(q))
    q2 = tf.rotmat_to_quat(R)
    # Same rotation up to sign.
    dot = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rotmat_orthonormal(rng):
    q = rng.normal(size=(32, 4)).astype(np.float32) * 3.0  # unnormalized
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_pose_matrix_roundtrip(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3)).astype(np.float32)
    T = tf.pose_to_matrix(jnp.asarray(q), jnp.asarray(t))
    q2, t2 = tf.matrix_to_pose(T)
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(q2) * q, -1)), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-5)


def test_invert_se3(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3)).astype(np.float32)
    T = tf.pose_to_matrix(jnp.asarray(q), jnp.asarray(t))
    TT = np.einsum("nij,njk->nik", np.asarray(T), np.asarray(tf.invert_se3(T)))
    np.testing.assert_allclose(TT, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_transform_points(rng):
    q = random_quat(rng)
    t = rng.normal(size=(3,)).astype(np.float32)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    T = tf.pose_to_matrix(jnp.asarray(q), jnp.asarray(t))
    out = tf.transform_points(T, jnp.asarray(pts))
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(np.asarray(out), pts @ R.T + t, atol=1e-5)


def test_so3_exp_small_angle():
    w = jnp.array([1e-9, 0.0, 0.0])
    R = tf.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    w = jnp.array([0.0, 0.0, np.pi / 2])
    R = np.asarray(tf.so3_exp(w))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_se3_exp_matches_composition():
    xi = jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 0.0])
    T = np.asarray(tf.se3_exp(xi))
    np.testing.assert_allclose(T[:3, 3], [0.1, -0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_quat_to_rotmat_differentiable():
    def f(q):
        return jnp.sum(tf.quat_to_rotmat(q) ** 2)

    g = jax.grad(f)(jnp.array([1.0, 0.2, -0.3, 0.1]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_quat_multiply_matches_rotation_composition(rng):
    qa = jnp.asarray(random_quat(rng))
    qb = jnp.asarray(random_quat(rng))
    Rab = tf.quat_to_rotmat(tf.quat_multiply(qa, qb))
    np.testing.assert_allclose(
        np.asarray(Rab),
        np.asarray(tf.quat_to_rotmat(qa)) @ np.asarray(tf.quat_to_rotmat(qb)),
        atol=1e-5,
    )
