"""SearchBySim3 parity (src/ORBmatcher.cc:1102-1308): grow loop matches
from a Sim3 estimate with mutual best-Hamming agreement."""

import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.transforms import invert_se3
from gsorb_slam_tpu.frontend.matcher import search_by_sim3
from gsorb_slam_tpu.frontend.orb import ORBFeatures

CAM = Camera(fx=200.0, fy=200.0, cx=80.0, cy=60.0, width=160, height=120)


def _feats(uv, desc, octave, valid):
    N = len(uv)
    return ORBFeatures(
        uv=jnp.asarray(uv, jnp.float32),
        response=jnp.ones(N, jnp.float32),
        angle=jnp.zeros(N, jnp.float32),
        octave=jnp.asarray(octave, jnp.int32),
        descriptors=jnp.asarray(desc, jnp.uint32),
        valid=jnp.asarray(valid),
        uv_raw=jnp.asarray(uv, jnp.float32),
    )


def _project(T_cw, world):
    xc = world @ np.asarray(T_cw)[:3, :3].T + np.asarray(T_cw)[:3, 3]
    u = CAM.fx * xc[:, 0] / xc[:, 2] + CAM.cx
    v = CAM.fy * xc[:, 1] / xc[:, 2] + CAM.cy
    return np.stack([u, v], -1).astype(np.float32), xc


def test_search_by_sim3_mutual_grow():
    rng = np.random.default_rng(7)
    n = 48
    world = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.35, 0.35, n),
         rng.uniform(1.5, 3.0, n)], -1,
    ).astype(np.float32)
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)

    T1 = np.eye(4, dtype=np.float32)
    # KF2: world poses drifted by a known SE3 (the loop drift); its own
    # T2_cw is a slightly different viewpoint.
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, 3] = [0.1, 0.0, -0.2]

    uv1, _ = _project(T1, world)
    uv2, _ = _project(T2, world)
    inb1 = (uv1[:, 0] > 2) & (uv1[:, 0] < 158) & (uv1[:, 1] > 2) & (uv1[:, 1] < 118)
    inb2 = (uv2[:, 0] > 2) & (uv2[:, 0] < 158) & (uv2[:, 1] > 2) & (uv2[:, 1] < 118)
    ok = inb1 & inb2
    oct_ = np.zeros(n, np.int32)
    f1 = _feats(uv1, desc, oct_, ok)
    f2 = _feats(uv2, desc, oct_, ok)

    # Exact relative camera transform: cam1 = T12 cam2.
    T12 = np.asarray(T1 @ np.asarray(invert_se3(jnp.asarray(T2)))).astype(
        np.float32
    )

    sf = (1.2 ** np.arange(8)).astype(np.float32)
    dist1 = np.linalg.norm(world, axis=-1).astype(np.float32)
    max_d = dist1 * sf[0]
    min_d = max_d / sf[-1]

    # A few features already matched -> must be excluded from growth.
    already = np.zeros(n, bool)
    already[:4] = True
    valid1 = ok & ~already
    valid2 = ok & ~already

    m12, n_new = search_by_sim3(
        jnp.asarray(world), jnp.asarray(desc), jnp.asarray(valid1),
        jnp.asarray(min_d), jnp.asarray(max_d), f1,
        jnp.asarray(world), jnp.asarray(desc), jnp.asarray(valid2),
        jnp.asarray(min_d), jnp.asarray(max_d), f2,
        jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(T12[:3, :3]), jnp.asarray(T12[:3, 3]),
        CAM, jnp.asarray(sf),
    )
    m12 = np.asarray(m12)
    # Every grown match must be the identity pairing (same synthetic point),
    # excluded features must stay unmatched, and most valid ones recovered.
    grown = np.nonzero(m12 >= 0)[0]
    assert len(grown) >= 0.8 * (valid1.sum())
    assert np.all(m12[grown] == grown)
    assert np.all(m12[:4] == -1)
    assert int(n_new) == len(grown)


def test_search_by_sim3_respects_transform():
    """With a WRONG Sim3 the projections land far away -> no matches."""
    rng = np.random.default_rng(11)
    n = 32
    world = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.35, 0.35, n),
         rng.uniform(1.5, 3.0, n)], -1,
    ).astype(np.float32)
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    uv, _ = _project(T1, world)
    ok = np.ones(n, bool)
    f1 = _feats(uv, desc, np.zeros(n, np.int32), ok)
    f2 = _feats(uv, desc, np.zeros(n, np.int32), ok)
    sf = (1.2 ** np.arange(8)).astype(np.float32)
    dist1 = np.linalg.norm(world, axis=-1).astype(np.float32)
    max_d = dist1
    min_d = max_d / sf[-1]
    bad_T12 = np.eye(4, dtype=np.float32)
    bad_T12[:3, 3] = [1.5, 1.5, 0.0]  # ~300px offset at z=2
    m12, n_new = search_by_sim3(
        jnp.asarray(world), jnp.asarray(desc), jnp.asarray(ok),
        jnp.asarray(min_d), jnp.asarray(max_d), f1,
        jnp.asarray(world), jnp.asarray(desc), jnp.asarray(ok),
        jnp.asarray(min_d), jnp.asarray(max_d), f2,
        jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(bad_T12[:3, :3]), jnp.asarray(bad_T12[:3, 3]),
        CAM, jnp.asarray(sf),
    )
    assert int(n_new) == 0
