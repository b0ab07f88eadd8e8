"""Vocabulary, Sim3, pose graph, keyframe database, geometric frontend."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import ORBConfig
from gsorb_slam_tpu.core.transforms import se3_exp
from gsorb_slam_tpu.frontend import sim3 as S3
from gsorb_slam_tpu.frontend.ba import pose_graph_optimization
from gsorb_slam_tpu.frontend.vocab import build_vocabulary, score_l1
from gsorb_slam_tpu.slam.geometric import GeometricFrontend
from gsorb_slam_tpu.slam.loop import KeyFrameDatabase


def rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def test_vocabulary_roundtrip(rng):
    train = rand_desc(rng, 800)
    voc = build_vocabulary(train, k=4, L=3, seed=1)
    assert voc.n_words > 20
    d = jnp.asarray(train[:100])
    wid, w = voc.transform(d, jnp.ones(100, bool))
    wid = np.asarray(wid)
    assert (wid >= 0).all() and (wid < voc.n_words).all()
    # Same descriptors map to same words deterministically.
    wid2, _ = voc.transform(d, jnp.ones(100, bool))
    np.testing.assert_array_equal(wid, np.asarray(wid2))


def test_bow_scoring_discriminates(rng):
    train = rand_desc(rng, 1000)
    voc = build_vocabulary(train, k=4, L=3, seed=1)
    a = jnp.asarray(train[:80])
    # b = a with a few bits flipped (similar frame); c = fresh random
    b_np = train[:80].copy()
    b_np[:, 0] ^= 3
    b = jnp.asarray(b_np)
    c = jnp.asarray(rand_desc(rng, 80))
    ones = jnp.ones(80, bool)
    va = voc.bow_vector(a, ones)
    vb = voc.bow_vector(b, ones)
    vc = voc.bow_vector(c, ones)
    assert score_l1(va, vb) > score_l1(va, vc)
    assert score_l1(va, va) == pytest.approx(1.0, abs=1e-6)


def test_keyframe_database_query(rng):
    train = rand_desc(rng, 1000)
    voc = build_vocabulary(train, k=4, L=3, seed=1)
    db = KeyFrameDatabase(voc)
    ones = jnp.ones(60, bool)
    for i in range(5):
        db.add(i, jnp.asarray(rand_desc(rng, 60)), ones)
    # kf 5 revisits kf 1's descriptors (a loop)
    loop_desc = np.array(np.asarray(db.bows and train[:60]))  # reuse train block
    db.add(1, jnp.asarray(train[:60]), ones)  # overwrite kf1 with known set
    db.add(5, jnp.asarray(train[:60]), ones)
    cands = db.query(5, exclude={4, 5}, min_score=0.05)
    assert cands and cands[0][0] == 1


def test_ransac_sim3_recovers_transform(rng):
    n = 200
    p1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    T = np.asarray(se3_exp(jnp.array([0.3, -0.2, 0.5, 0.1, 0.2, -0.15])))
    p2 = p1 @ T[:3, :3].T + T[:3, 3]
    # 20% outliers
    p2[:40] += rng.uniform(1, 3, (40, 3))
    res = S3.ransac_sim3(
        jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool),
        jax.random.PRNGKey(0), fix_scale=True,
    )
    assert int(res.n_inliers) > 140
    np.testing.assert_allclose(np.asarray(res.R), T[:3, :3], atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), T[:3, 3], atol=1e-2)


def test_pose_graph_closes_loop(rng):
    """A drifted odometry chain with one loop edge must snap back."""
    K = 20
    poses_gt = []
    T = np.eye(4, dtype=np.float32)
    for k in range(K):
        poses_gt.append(T.copy())
        step = np.asarray(se3_exp(jnp.asarray([0.1, 0, 0, 0, 0.05, 0], dtype=jnp.float32)))
        T = step @ T
    poses_gt = np.stack(poses_gt)

    # Simulate drift: each odometry step slightly biased.
    poses_drift = [poses_gt[0]]
    for k in range(1, K):
        rel_gt = poses_gt[k] @ np.linalg.inv(poses_gt[k - 1])
        noise = np.asarray(
            se3_exp(jnp.asarray([0.01, 0.004, 0, 0, 0.006, 0], dtype=jnp.float32))
        )
        poses_drift.append(noise @ rel_gt @ poses_drift[-1])
    poses_drift = np.stack(poses_drift).astype(np.float32)

    edges_i = np.arange(K - 1, dtype=np.int32)
    edges_j = edges_i + 1
    rels = np.stack(
        [poses_drift[a] @ np.linalg.inv(poses_drift[a + 1]) for a in range(K - 1)]
    )
    # loop edge: node K-1 <-> node 0 with the TRUE relative pose.
    edges_i = np.concatenate([edges_i, [K - 1]])
    edges_j = np.concatenate([edges_j, [0]])
    rels = np.concatenate(
        [rels, (poses_gt[K - 1] @ np.linalg.inv(poses_gt[0]))[None]]
    ).astype(np.float32)
    w = np.concatenate([np.ones(K - 1), [5.0]]).astype(np.float32)
    fixed = np.zeros(K, bool)
    fixed[0] = True

    out = np.asarray(
        pose_graph_optimization(
            jnp.asarray(poses_drift), jnp.asarray(edges_i), jnp.asarray(edges_j),
            jnp.asarray(rels), jnp.asarray(w), jnp.asarray(fixed), iters=100,
        )
    )
    err_before = np.linalg.norm(poses_drift[-1][:3, 3] - poses_gt[-1][:3, 3])
    err_after = np.linalg.norm(out[-1][:3, 3] - poses_gt[-1][:3, 3])
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_pose_graph_multi_loop(rng):
    """Two nested loops on a figure-eight-like chain: the essential graph
    must use BOTH loop edges to pull the whole drifted chain back — a
    sequential-only edge set distorts here because correcting the second
    loop re-breaks the first (``src/Optimizer.cc:782-1045`` consumes the
    spanning tree + all loop edges for exactly this reason)."""
    K = 30
    poses_gt = []
    T = np.eye(4, dtype=np.float32)
    for k in range(K):
        poses_gt.append(T.copy())
        # two circles: yaw rate flips sign halfway -> the chain revisits
        # node 0's neighbourhood at k=15 and again at k=29
        yaw = 2 * np.pi / 15 * (1.0 if k < 15 else -1.0)
        step = np.asarray(se3_exp(jnp.asarray([0.2, 0, 0, 0, yaw, 0], jnp.float32)))
        T = step @ T
    poses_gt = np.stack(poses_gt)

    poses_drift = [poses_gt[0]]
    for k in range(1, K):
        rel_gt = poses_gt[k] @ np.linalg.inv(poses_gt[k - 1])
        noise = np.asarray(
            se3_exp(jnp.asarray([0.015, 0.005, 0, 0, 0.008, 0], jnp.float32))
        )
        poses_drift.append(noise @ rel_gt @ poses_drift[-1])
    poses_drift = np.stack(poses_drift).astype(np.float32)

    edges_i = list(range(K - 1))
    edges_j = list(range(1, K))
    rels = [poses_drift[a] @ np.linalg.inv(poses_drift[a + 1]) for a in range(K - 1)]
    w = [1.0] * (K - 1)
    # loop edges with TRUE relative poses: 15<->0 and 29<->0
    for a, b in [(15, 0), (K - 1, 0)]:
        edges_i.append(a)
        edges_j.append(b)
        rels.append(poses_gt[a] @ np.linalg.inv(poses_gt[b]))
        w.append(5.0)
    fixed = np.zeros(K, bool)
    fixed[0] = True

    out = np.asarray(
        pose_graph_optimization(
            jnp.asarray(poses_drift),
            jnp.asarray(np.asarray(edges_i, np.int32)),
            jnp.asarray(np.asarray(edges_j, np.int32)),
            jnp.asarray(np.stack(rels).astype(np.float32)),
            jnp.asarray(np.asarray(w, np.float32)),
            jnp.asarray(fixed), iters=150,
        )
    )
    # BOTH loop keyframes must land near GT; mid-chain nodes only smooth
    # (their odometry edges still carry the drift bias — same as g2o), so
    # require improvement, not a snap.
    def err(node, P):
        return np.linalg.norm(P[node][:3, 3] - poses_gt[node][:3, 3])

    for node in (15, K - 1):
        assert err(node, out) < 0.5 * err(node, poses_drift), node
    for node in (8, 22):
        assert err(node, out) < err(node, poses_drift), node
    # and total chain error must drop substantially
    tot_before = sum(err(k, poses_drift) for k in range(K))
    tot_after = sum(err(k, out) for k in range(K))
    assert tot_after < 0.6 * tot_before, (tot_before, tot_after)


def _textured(rng, h=120, w=160, n=60):
    img = np.zeros((h, w), np.float32)
    for _ in range(n):
        y, x = rng.integers(22, h - 30), rng.integers(22, w - 30)
        img[y : y + rng.integers(5, 12), x : x + rng.integers(5, 12)] = rng.uniform(
            0.4, 1.0
        )
    return img


def test_geometric_frontend_tracks(rng):
    """Create a KF with depth, then track a nearby frame: ORB pose
    optimization should land near identity (static scene, small motion)."""
    cam = Camera(fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120)
    fe = GeometricFrontend(cam, ORBConfig(n_features=300, n_levels=3), max_points=5000)
    img = _textured(rng)
    depth = np.full(img.shape, 2.0, np.float32)

    feats = fe._extract(jnp.asarray(img))
    fe.create_keyframe(feats, depth, np.eye(4, dtype=np.float32), frame_id=0)
    assert fe.n_points > 50

    res = fe.process_frame(img, np.eye(4, dtype=np.float32))
    assert res.T_orb is not None
    assert res.n_inliers > 30
    assert np.linalg.norm(res.T_orb[:3, 3]) < 0.02
    assert int(jnp.sum(res.matches.valid)) == res.n_inliers or int(
        jnp.sum(res.matches.valid)
    ) == min(res.n_inliers, fe.match_capacity)


def test_search_by_bow_direct_index(rng):
    """SearchByBoW (src/ORBmatcher.cc:159): matches must share the direct-
    index node bucket, and on a shifted view the bucketed search should
    recover a healthy fraction of the brute-force matches."""
    import jax.numpy as jnp

    from gsorb_slam_tpu.core.config import ORBConfig
    from gsorb_slam_tpu.frontend.matcher import match_descriptors, search_by_bow
    from gsorb_slam_tpu.frontend.orb import extract_orb
    from gsorb_slam_tpu.frontend.vocab import build_vocabulary

    img = _textured(rng, h=240, w=320, n=150)
    img2 = np.roll(img, -7, axis=1)
    cfg = ORBConfig(n_features=300, n_levels=2)
    f1 = extract_orb(jnp.asarray(img), cfg)
    f2 = extract_orb(jnp.asarray(img2), cfg)
    d = np.asarray(f1.descriptors)[np.asarray(f1.valid)]
    voc = build_vocabulary(d, k=6, L=3, seed=1)
    _w1, _t1, n1 = voc.transform_with_nodes(f1.descriptors, f1.valid)
    _w2, _t2, n2 = voc.transform_with_nodes(f2.descriptors, f2.valid)

    mb = search_by_bow(f1, f2, n1, n2)
    mref = match_descriptors(f1, f2, max_dist=50, ratio=0.75)
    nb = int(np.asarray(mb.valid).sum())
    nr = int(np.asarray(mref.valid).sum())
    assert nb >= max(10, int(0.4 * nr)), (nb, nr)
    # every bucketed match shares its direct-index node
    v = np.asarray(mb.valid)
    i2 = np.asarray(mb.idx2)
    n1_np, n2_np = np.asarray(n1), np.asarray(n2)
    for i in np.nonzero(v)[0]:
        assert n1_np[i] == n2_np[i2[i]]


def test_pose_graph_stress_large_drift(rng):
    """Essential-graph stress (VERDICT r3 item 9): accumulated drift 10x the
    multi-loop test's magnitude. The graph must still pull the loop nodes
    back and cut total chain error — the regime where g2o's full LM
    (``src/Optimizer.cc:782``) is the bar."""
    K = 30
    poses_gt = []
    T = np.eye(4, dtype=np.float32)
    for k in range(K):
        poses_gt.append(T.copy())
        yaw = 2 * np.pi / 15 * (1.0 if k < 15 else -1.0)
        step = np.asarray(se3_exp(jnp.asarray([0.2, 0, 0, 0, yaw, 0], jnp.float32)))
        T = step @ T
    poses_gt = np.stack(poses_gt)

    poses_drift = [poses_gt[0]]
    for k in range(1, K):
        rel_gt = poses_gt[k] @ np.linalg.inv(poses_gt[k - 1])
        noise = np.asarray(
            se3_exp(jnp.asarray([0.15, 0.05, 0, 0, 0.08, 0], jnp.float32))
        )
        poses_drift.append(noise @ rel_gt @ poses_drift[-1])
    poses_drift = np.stack(poses_drift).astype(np.float32)

    edges_i = list(range(K - 1))
    edges_j = list(range(1, K))
    rels = [poses_drift[a] @ np.linalg.inv(poses_drift[a + 1]) for a in range(K - 1)]
    w = [1.0] * (K - 1)
    for a, b in [(15, 0), (K - 1, 0)]:
        edges_i.append(a)
        edges_j.append(b)
        rels.append(poses_gt[a] @ np.linalg.inv(poses_gt[b]))
        w.append(5.0)
    fixed = np.zeros(K, bool)
    fixed[0] = True

    out = np.asarray(
        pose_graph_optimization(
            jnp.asarray(poses_drift),
            jnp.asarray(np.asarray(edges_i, np.int32)),
            jnp.asarray(np.asarray(edges_j, np.int32)),
            jnp.asarray(np.stack(rels).astype(np.float32)),
            jnp.asarray(np.asarray(w, np.float32)),
            jnp.asarray(fixed), iters=300,
        )
    )

    def err(node, P):
        return np.linalg.norm(P[node][:3, 3] - poses_gt[node][:3, 3])

    for node in (15, K - 1):
        assert err(node, out) < 0.5 * err(node, poses_drift), (
            node, err(node, out), err(node, poses_drift)
        )
    tot_before = sum(err(k, poses_drift) for k in range(K))
    tot_after = sum(err(k, out) for k in range(K))
    assert tot_after < 0.6 * tot_before, (tot_before, tot_after)


def test_sim3_pose_graph_stress_rotation_and_scale(rng):
    """Sim3 essential-graph stress: the SE3 stress test's 10x accumulated
    drift with per-step monocular SCALE drift layered on top and large
    accumulated rotation — the regime where the old scalar-H / ±identity
    sweep mis-distributes corrections (it was deleted for exactly this; the
    SE3 twin diverged from g2o here). Bar: the same error-reduction factors
    the SE3 stress test asserts, plus scale recovery at the loop nodes."""
    from gsorb_slam_tpu.frontend.ba import sim3_pose_graph_optimization

    K = 30
    poses_gt = []
    T = np.eye(4, dtype=np.float32)
    for k in range(K):
        poses_gt.append(T.copy())
        yaw = 2 * np.pi / 15 * (1.0 if k < 15 else -1.0)
        step = np.asarray(se3_exp(jnp.asarray([0.2, 0, 0, 0, yaw, 0], jnp.float32)))
        T = step @ T
    poses_gt = np.stack(poses_gt)

    # drifted chain: SE3 noise per step (same as the SE3 stress test) PLUS
    # 3%/step scale drift — ~2.4x accumulated scale error over the chain.
    ls_step = 0.03
    poses_drift = [poses_gt[0]]
    ls_drift = [0.0]
    for k in range(1, K):
        rel_gt = poses_gt[k] @ np.linalg.inv(poses_gt[k - 1])
        noise = np.asarray(
            se3_exp(jnp.asarray([0.15, 0.05, 0, 0, 0.08, 0], jnp.float32))
        )
        poses_drift.append(noise @ rel_gt @ poses_drift[-1])
        ls_drift.append(ls_drift[-1] + ls_step)
    poses_drift = np.stack(poses_drift).astype(np.float32)
    ls_drift = np.asarray(ls_drift, np.float32)

    def sim3_of(P, ls):
        return (np.exp(ls), P[:3, :3], P[:3, 3])

    def s_compose(a, b):
        return (a[0] * b[0], a[1] @ b[1], a[0] * (a[1] @ b[2]) + a[2])

    def s_inv(a):
        Rt = a[1].T
        return (1.0 / a[0], Rt, -(1.0 / a[0]) * (Rt @ a[2]))

    # Odometry edges measure the DRIFTED relative Sim3 (consistent with the
    # drifted chain — zero residual at the start); loop edges measure GT.
    edges_i, edges_j, rels, rel_ls, w = [], [], [], [], []
    for a in range(K - 1):
        Si = sim3_of(poses_drift[a + 1], ls_drift[a + 1])
        Sj_inv = s_inv(sim3_of(poses_drift[a], ls_drift[a]))
        s_rel, R_rel, t_rel = s_compose(Si, Sj_inv)
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = R_rel
        M[:3, 3] = t_rel
        edges_i.append(a + 1)
        edges_j.append(a)
        rels.append(M)
        rel_ls.append(np.log(s_rel))
        w.append(1.0)
    for a, b in [(15, 0), (K - 1, 0)]:
        M = (poses_gt[a] @ np.linalg.inv(poses_gt[b])).astype(np.float32)
        edges_i.append(a)
        edges_j.append(b)
        rels.append(M)
        rel_ls.append(0.0)  # GT: no scale drift
        w.append(5.0)
    fixed = np.zeros(K, bool)
    fixed[0] = True

    out, out_ls = sim3_pose_graph_optimization(
        jnp.asarray(poses_drift),
        jnp.asarray(ls_drift),
        jnp.asarray(np.asarray(edges_i, np.int32)),
        jnp.asarray(np.asarray(edges_j, np.int32)),
        jnp.asarray(np.stack(rels).astype(np.float32)),
        jnp.asarray(np.asarray(rel_ls, np.float32)),
        jnp.asarray(np.asarray(w, np.float32)),
        jnp.asarray(fixed), iters=300,
    )
    out = np.asarray(out)
    out_ls = np.asarray(out_ls)

    def err(node, P, ls):
        # metric translation: t / s (Converter on g2o::Sim3 output)
        t = P[node][:3, 3] / np.exp(ls[node])
        return np.linalg.norm(t - poses_gt[node][:3, 3])

    for node in (15, K - 1):
        before = err(node, poses_drift, ls_drift)
        after = err(node, out, out_ls)
        # the GT loop edges pull the loop nodes essentially onto GT
        assert after < 0.1 * before, (node, before, after)
        # loop nodes are pinned to metric scale by the GT loop edges
        assert abs(out_ls[node]) < 0.3 * abs(ls_drift[node]), (
            node, ls_drift[node], out_ls[node]
        )
    tot_before = sum(err(k, poses_drift, ls_drift) for k in range(K))
    tot_after = sum(err(k, out, out_ls) for k in range(K))
    # Interior nodes sit at the graph optimum of the (drift-consistent)
    # odometry edges + GT loop edges — odometry residuals are zero on the
    # drifted chain, so the optimum only bends the chain where the loop
    # edges pull (measured optimum: ~0.84x total metric error; a
    # half-converged solver can score LOWER on this GT metric while being
    # farther from the graph optimum). The load-bearing assertions are the
    # loop-node snaps above and the SE3-equivalence check below.
    assert tot_after < 0.9 * tot_before, (tot_before, tot_after)

    # Same bar as the SE3 graph: on SCALE-FREE input (zero log-scales,
    # zero relative scales, the SE3 stress test's exact edges) the Sim3
    # solver must reproduce pose_graph_optimization's solution quality.
    edges_i2 = list(range(K - 1))
    edges_j2 = list(range(1, K))
    rels2 = [
        poses_drift[a] @ np.linalg.inv(poses_drift[a + 1]) for a in range(K - 1)
    ]
    w2 = [1.0] * (K - 1)
    for a, b in [(15, 0), (K - 1, 0)]:
        edges_i2.append(a)
        edges_j2.append(b)
        rels2.append((poses_gt[a] @ np.linalg.inv(poses_gt[b])).astype(np.float32))
        w2.append(5.0)
    args = (
        jnp.asarray(np.asarray(edges_i2, np.int32)),
        jnp.asarray(np.asarray(edges_j2, np.int32)),
        jnp.asarray(np.stack(rels2).astype(np.float32)),
    )
    wj = jnp.asarray(np.asarray(w2, np.float32))
    fj = jnp.asarray(fixed)
    out_se3 = np.asarray(
        pose_graph_optimization(jnp.asarray(poses_drift), *args, wj, fj, iters=300)
    )
    out_s7, _ = sim3_pose_graph_optimization(
        jnp.asarray(poses_drift), jnp.zeros(K, jnp.float32),
        *args, jnp.zeros(len(rels2), jnp.float32), wj, fj, iters=300,
    )
    out_s7 = np.asarray(out_s7)

    def err0(node, P):
        return np.linalg.norm(P[node][:3, 3] - poses_gt[node][:3, 3])

    t_se3 = sum(err0(k, out_se3) for k in range(K))
    t_s7 = sum(err0(k, out_s7) for k in range(K))
    assert t_s7 < 1.1 * t_se3, (t_se3, t_s7)
