"""Loop detection and closure.

Rebuilds the reference's ``KeyFrameDatabase`` (inverted BoW index +
covisibility-consistent candidate grouping, ``src/KeyFrameDatabase.cc:76``)
and ``LoopClosing`` (``src/LoopClosing.cc``): candidate detection ->
geometric verification with the batched RANSAC Sim3/SE3 solver
(``frontend/sim3.py``) -> pose-graph correction
(``frontend/ba.pose_graph_optimization``, the fixed-scale analog of
``OptimizeEssentialGraph``).

As in the reference, the Gaussian map is NOT warped on loop closure — it
re-couples through subsequently re-rendered keyframe poses
(``src/LoopClosing.cc`` note in SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.frontend import sim3 as S3
from gsorb_slam_tpu.frontend.ba import pose_graph_optimization
from gsorb_slam_tpu.frontend.matcher import match_descriptors
from gsorb_slam_tpu.frontend.vocab import Vocabulary, score_l1


class KeyFrameDatabase:
    """Inverted word -> keyframe index (``KeyFrameDatabase``)."""

    def __init__(self, vocab: Vocabulary):
        self.vocab = vocab
        self.inverted: dict[int, set[int]] = {}
        self.bows: dict[int, dict[int, float]] = {}

    def add(self, kf_id: int, descriptors, valid) -> None:
        bow = self.vocab.bow_vector(descriptors, valid)
        self.bows[kf_id] = bow
        for w in bow:
            self.inverted.setdefault(w, set()).add(kf_id)

    def query_descriptors(
        self, descriptors, valid, exclude: set[int] = frozenset(),
        rel_factor: float = 0.75,
    ) -> list[tuple[int, float]]:
        """Relocalization retrieval for a FRAME (not yet a keyframe):
        candidates sharing words with the query, kept within
        ``rel_factor`` of the best score —
        ``KeyFrameDatabase::DetectRelocalizationCandidates``
        (``src/KeyFrameDatabase.cc:199``: word-sharing prefilter at 0.8 of
        max-common, then 0.75 * best-accumulated-score gate)."""
        bow = self.vocab.bow_vector(descriptors, valid)
        if not bow:
            return []
        sharing: dict[int, int] = {}
        for w in bow:
            for other in self.inverted.get(w, ()):
                if other not in exclude:
                    sharing[other] = sharing.get(other, 0) + 1
        if not sharing:
            return []
        max_common = max(sharing.values())
        scored = [
            (other, score_l1(bow, self.bows[other]))
            for other, common in sharing.items()
            if common >= 0.8 * max_common
        ]
        if not scored:
            return []
        best = max(s for _, s in scored)
        out = [(o, s) for o, s in scored if s >= rel_factor * best]
        out.sort(key=lambda x: -x[1])
        return out

    def query(
        self, kf_id: int, exclude: set[int], min_score: float
    ) -> list[tuple[int, float]]:
        """Candidates sharing words, scored >= min_score
        (``DetectLoopCandidates`` core; the reference additionally groups by
        covisibility consistency over 3 consecutive detections — callers
        track that)."""
        bow = self.bows.get(kf_id)
        if not bow:
            return []
        sharing: dict[int, int] = {}
        for w in bow:
            for other in self.inverted.get(w, ()):
                if other != kf_id and other not in exclude:
                    sharing[other] = sharing.get(other, 0) + 1
        if not sharing:
            return []
        max_common = max(sharing.values())
        out = []
        for other, common in sharing.items():
            if common < 0.8 * max_common:
                continue
            s = score_l1(bow, self.bows[other])
            if s >= min_score:
                out.append((other, s))
        out.sort(key=lambda x: -x[1])
        return out


@dataclasses.dataclass
class LoopClosure:
    query_kf: int
    match_kf: int
    T_correction: np.ndarray  # corrective transform for the query pose


def _sim3_compose(a, b):
    """(s,R,t) triples: (a ∘ b)(x) = a(b(x))."""
    sa, Ra, ta = a
    sb, Rb, tb = b
    return (sa * sb, Ra @ Rb, sa * (Ra @ tb) + ta)


def _sim3_inv(a):
    s, R, t = a
    return (1.0 / s, R.T, -(R.T @ t) / s)


def _sim3_mat(a) -> np.ndarray:
    """Embed (s,R,t) as a 4x4 with sR in the linear block (g2o Scw style)."""
    s, R, t = a
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = s * R
    M[:3, 3] = t
    return M


def _sim3_from_mat(M: np.ndarray):
    A = M[:3, :3]
    s = float(np.cbrt(max(np.linalg.det(A), 1e-18)))
    return (s, (A / s).astype(np.float32), M[:3, 3].astype(np.float32))


class LoopCloser:
    """Detection with temporal consistency + Sim3/SE3 verification +
    pose-graph correction. ``min_consistency`` mirrors
    mnCovisibilityConsistencyTh=3. ``fix_scale`` mirrors ``mbFixScale``
    (``src/LoopClosing.cc:234``): True for RGB-D/stereo, False for
    monocular — scale then flows through verification (7-DoF
    ``OptimizeSim3``) and the essential graph."""

    def __init__(
        self,
        vocab: Vocabulary,
        min_score: float = 0.015,
        min_inliers: int = 20,
        min_consistency: int = 3,
        min_gap: int = 10,
        fix_scale: bool = True,
    ):
        self.fix_scale = fix_scale
        self.db = KeyFrameDatabase(vocab)
        self.min_score = min_score
        self.min_inliers = min_inliers
        self.min_consistency = min_consistency
        self.min_gap = min_gap
        self.consistency: dict[int, int] = {}
        # Cooldown after a successful closure: the reference skips detection
        # for 10 keyframes past the last loop (LoopClosing::DetectLoop,
        # ``src/LoopClosing.cc:105``: mnId < mLastLoopKFid + 10).
        self.last_closed_kf: int = -1000
        self.key = jnp.asarray(np.array([0, 42], np.uint32))

    def add_keyframe(self, kf) -> None:
        self.db.add(kf.kf_id, kf.feats.descriptors, kf.feats.valid)

    def detect(self, kf, recent_ids: set[int]) -> Optional[int]:
        if kf.kf_id < self.last_closed_kf + 10:
            self.consistency = {}
            return None
        cands = self.db.query(kf.kf_id, recent_ids, self.min_score)
        new_consistency: dict[int, int] = {}
        detected = None
        for cid, _score in cands:
            streak = 1 + max(
                (v for k, v in self.consistency.items() if abs(k - cid) <= 2),
                default=0,
            )
            new_consistency[cid] = streak
            if streak >= self.min_consistency and detected is None:
                detected = cid
        self.consistency = new_consistency
        return detected

    def verify(
        self, kf_query, kf_match, frontend, cam=None, debug: bool = False
    ) -> Optional[np.ndarray]:
        """Geometric check: match descriptors, align the matched map points
        with fixed-scale RANSAC Horn (``Sim3Solver``), then refine on
        bidirectional image-plane reprojection edges
        (``Optimizer::OptimizeSim3`` ``src/Optimizer.cc:1047``); returns the
        world-frame correction transform or None."""
        # Direct-index-bucketed candidates (SearchByBoW KF<->KF,
        # src/ORBmatcher.cc:522) via the vocabulary's FeatureVector nodes.
        from gsorb_slam_tpu.frontend.matcher import search_by_bow

        voc = self.db.vocab
        _w1, _t1, n1 = voc.transform_with_nodes(
            kf_query.feats.descriptors, kf_query.feats.valid
        )
        _w2, _t2, n2 = voc.transform_with_nodes(
            kf_match.feats.descriptors, kf_match.feats.valid
        )
        m = search_by_bow(kf_query.feats, kf_match.feats, n1, n2, max_dist=64)
        mv = np.asarray(m.valid)
        idx2 = np.asarray(m.idx2)
        p1_ids = kf_query.point_ids
        p2_ids = kf_match.point_ids
        pairs = []
        kp_pairs = []
        for i in np.nonzero(mv)[0]:
            p1 = p1_ids[i]
            p2 = p2_ids[idx2[i]]
            if p1 >= 0 and p2 >= 0 and frontend.pt_valid[p1] and frontend.pt_valid[p2]:
                pairs.append((p1, p2))
                kp_pairs.append((i, idx2[i]))
        if debug:
            print(
                f"    verify[{kf_query.kf_id}->{kf_match.kf_id}]: "
                f"bow_matches={int(mv.sum())} mp_pairs={len(pairs)} "
                f"(min {self.min_inliers})", flush=True,
            )
        if len(pairs) < self.min_inliers:
            return None
        pairs = np.array(pairs)
        kp_pairs = np.array(kp_pairs)
        x1 = frontend.pt_pos[pairs[:, 0]]
        x2 = frontend.pt_pos[pairs[:, 1]]
        # Pad to a power-of-two bucket: stable jit shapes across calls.
        n = len(pairs)
        cap = 64
        while cap < n:
            cap *= 2
        pad = cap - n
        if pad:
            x1 = np.concatenate([x1, np.zeros((pad, 3), x1.dtype)])
            x2 = np.concatenate([x2, np.zeros((pad, 3), x2.dtype)])
        pvalid = np.zeros(cap, bool)
        pvalid[:n] = True
        res = S3.ransac_sim3(
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(pvalid),
            jnp.asarray(self.key), fix_scale=self.fix_scale,
        )
        if debug:
            print(
                f"    verify: ransac_inliers={int(res.n_inliers)}", flush=True
            )
        if int(res.n_inliers) < self.min_inliers:
            return None
        # Iterative inlier refinement — the ``OptimizeSim3`` analog
        # (``src/Optimizer.cc:1047``: optimize, drop chi2 outliers, optimize
        # again). Re-gate on 3D residuals against a shrinking threshold and
        # refit Horn on the surviving set.
        R = np.asarray(res.R)
        t = np.asarray(res.t)
        s = float(res.s)
        inl = np.asarray(res.inliers)
        x1r, x2r = x1[:n], x2[:n]
        for th in (0.10, 0.07, 0.05):
            r = x2r - (s * (x1r @ R.T) + t)
            d = np.linalg.norm(r, axis=-1)
            inl = d < th
            if debug:
                print(
                    f"    verify: refit th={th} inliers={int(inl.sum())}",
                    flush=True,
                )
            if inl.sum() < self.min_inliers:
                return None
            # numpy Horn fit (dynamic inlier counts would recompile jit);
            # scale via the singular-value form when not fixed
            # (src/Sim3Solver.cc:227 ComputeSim3).
            a, b = x1r[inl], x2r[inl]
            mu1, mu2 = a.mean(0), b.mean(0)
            ca, cb = a - mu1, b - mu2
            W = cb.T @ ca
            U, S_sv, Vt = np.linalg.svd(W)
            sgn = np.sign(np.linalg.det(U @ Vt))
            D = np.diag([1.0, 1.0, sgn])
            R = (U @ D @ Vt).astype(np.float32)
            if not self.fix_scale:
                s = float(
                    (S_sv[0] + S_sv[1] + sgn * S_sv[2])
                    / max((ca * ca).sum(), 1e-12)
                )
            t = (mu2 - s * (R @ mu1)).astype(np.float32)
        # World-frame drift correction: x2 = s R x1 + t maps query-side
        # point coordinates onto match-side (older, drift-free) coordinates
        # — a Sim3 when fix_scale=False, embedded as sR|t.
        T_corr = _sim3_mat((s, R, t))

        if cam is not None:
            # OptimizeSim3 analog: refine on image-plane reprojection edges
            # in BOTH keyframes (src/Optimizer.cc:1047+). Camera-level
            # transform T12 = T1_cw . T_corr^-1 . T2_cw^-1.
            from gsorb_slam_tpu.frontend.sim3 import optimize_sim3_reprojection

            T1 = kf_query.T_cw
            T2 = kf_match.T_cw
            # Sim3 embeddings (sR|t) compose/invert as plain 4x4 algebra:
            # S12 = T1 ∘ S_corr^{-1} ∘ T2^{-1}, with s12 = 1/s_corr.
            T12 = T1 @ np.linalg.inv(T_corr) @ np.linalg.inv(T2)
            s12, R12, t12 = _sim3_from_mat(T12)
            T12_se3 = np.eye(4, dtype=np.float32)
            T12_se3[:3, :3] = R12
            T12_se3[:3, 3] = t12

            # SearchBySim3 (src/ORBmatcher.cc:1102): grow the match set with
            # the Sim3 estimate before the reprojection refinement — project
            # each side's unmatched map points into the other keyframe and
            # keep mutual best-Hamming agreements.
            from gsorb_slam_tpu.frontend.matcher import search_by_sim3

            def _per_feature(kf):
                pids = np.asarray(kf.point_ids)
                hasp = (pids >= 0) & frontend.pt_valid[np.maximum(pids, 0)]
                safe = np.maximum(pids, 0)
                return (
                    frontend.pt_pos[safe].astype(np.float32),
                    frontend.pt_desc[safe],
                    hasp,
                    frontend.pt_min_dist[safe].astype(np.float32),
                    frontend.pt_max_dist[safe].astype(np.float32),
                )
            w1, d1, h1, lo1, hi1 = _per_feature(kf_query)
            w2, d2, h2, lo2, hi2 = _per_feature(kf_match)
            h1[kp_pairs[:, 0]] = False  # already matched
            h2[kp_pairs[:, 1]] = False
            m12, n_new = search_by_sim3(
                jnp.asarray(w1), jnp.asarray(d1), jnp.asarray(h1),
                jnp.asarray(lo1), jnp.asarray(hi1), kf_query.feats,
                jnp.asarray(w2), jnp.asarray(d2), jnp.asarray(h2),
                jnp.asarray(lo2), jnp.asarray(hi2), kf_match.feats,
                jnp.asarray(T1.astype(np.float32)),
                jnp.asarray(T2.astype(np.float32)),
                jnp.asarray(s12, jnp.float32),
                jnp.asarray(R12.astype(np.float32)),
                jnp.asarray(t12.astype(np.float32)),
                cam,
                jnp.asarray(frontend.scale_factors, jnp.float32),
            )
            m12 = np.asarray(m12)
            grown = np.nonzero(m12 >= 0)[0]
            if debug:
                print(f"    verify: SearchBySim3 grew {len(grown)} matches",
                      flush=True)
            if len(grown):
                gp = np.stack([grown, m12[grown]], axis=1)
                kp_pairs = np.concatenate([kp_pairs, gp])
                gx1 = frontend.pt_pos[np.asarray(kf_query.point_ids)[gp[:, 0]]]
                gx2 = frontend.pt_pos[np.asarray(kf_match.point_ids)[gp[:, 1]]]
                x1 = np.concatenate([x1[:n], gx1.astype(np.float32)])
                x2 = np.concatenate([x2[:n], gx2.astype(np.float32)])
                inl = np.concatenate([inl, np.ones(len(grown), bool)])
                n = n + len(grown)

            xc1 = x1[:n] @ T1[:3, :3].T + T1[:3, 3]  # query points, cam-1
            xc2 = x2[:n] @ T2[:3, :3].T + T2[:3, 3]  # match points, cam-2
            uv1 = np.asarray(kf_query.feats.uv)[kp_pairs[:, 0]]
            uv2 = np.asarray(kf_match.feats.uv)[kp_pairs[:, 1]]
            oc1 = np.asarray(kf_query.feats.octave)[kp_pairs[:, 0]]
            oc2 = np.asarray(kf_match.feats.octave)[kp_pairs[:, 1]]
            s2 = frontend.sigma2 if hasattr(frontend, "sigma2") else None
            is1 = (1.0 / s2[oc1]).astype(np.float32) if s2 is not None else (
                np.ones(n, np.float32)
            )
            is2 = (1.0 / s2[oc2]).astype(np.float32) if s2 is not None else (
                np.ones(n, np.float32)
            )
            capn = 64
            while capn < n:
                capn *= 2
            padn = capn - n

            def padr(a, fill=0.0):
                if padn == 0:
                    return a
                return np.concatenate(
                    [a, np.full((padn,) + a.shape[1:], fill, a.dtype)]
                )

            pv = np.zeros(capn, bool)
            pv[:n] = inl  # start from Horn inliers
            T12_r, ls_r, inl_r, n_r = optimize_sim3_reprojection(
                jnp.asarray(T12_se3),
                jnp.asarray(padr(xc2.astype(np.float32))),
                jnp.asarray(padr(uv1.astype(np.float32))),
                jnp.asarray(padr(xc1.astype(np.float32))),
                jnp.asarray(padr(uv2.astype(np.float32))),
                jnp.asarray(padr(is1, 1.0)),
                jnp.asarray(padr(is2, 1.0)),
                jnp.asarray(pv),
                cam,
                fix_scale=self.fix_scale,
                log_s_init=float(np.log(max(s12, 1e-12))),
            )
            if int(n_r) >= self.min_inliers and bool(
                np.isfinite(np.asarray(T12_r)).all()
            ):
                # Recompose the refined Sim3 embedding and invert:
                # T_corr = T2^-1 ∘ S12^-1 ∘ T1 (4x4 algebra is exact for
                # sR|t embeddings).
                T12_np = np.asarray(T12_r)
                S12 = _sim3_mat(
                    (float(np.exp(ls_r)), T12_np[:3, :3], T12_np[:3, 3])
                )
                T_corr = (
                    np.linalg.inv(T2) @ np.linalg.inv(S12) @ T1
                ).astype(np.float32)
        return T_corr

    def correct(
        self,
        keyframes: list,
        query_kf_id: int,
        match_kf_id: int,
        T_corr: np.ndarray,
        covis_edges: list[tuple[int, int, float]],
    ) -> tuple[dict[int, np.ndarray], Optional[dict[int, np.ndarray]]]:
        """Pose-graph correction — the ``OptimizeEssentialGraph`` analog
        (``src/Optimizer.cc:782-1045``): spanning-TREE edges + covisibility
        edges keep relative poses, the loop edge pins query ~ match through
        T_corr (a Sim3 ``sR|t`` embedding when ``fix_scale=False``).

        Returns ``({kf_id: corrected T_cw}, point_corr)`` where
        ``point_corr`` is ``{kf_id: 4x4 Sim3 embedding}`` mapping each
        keyframe's OLD world coordinates to corrected ones (apply to map
        points by reference keyframe — ``LoopClosing::CorrectLoop``'s point
        transform, ``src/LoopClosing.cc:470-500``); None on the fixed-scale
        SE3 path, where the global BA polish recovers the points."""
        id_index = {kf.kf_id: i for i, kf in enumerate(keyframes)}
        K = len(keyframes)
        poses = np.stack([kf.T_cw for kf in keyframes]).astype(np.float32)

        edges_i, edges_j, rels, ws = [], [], [], []
        # Spanning-tree edges (KeyFrame::GetParent chain) — the essential
        # graph's backbone. Sequential odometry edges fill any gap where a
        # keyframe has no surviving parent.
        tree_pairs = set()
        for kf in keyframes:
            par = getattr(kf, "parent_id", -1)
            if par >= 0 and par in id_index:
                a, b = id_index[par], id_index[kf.kf_id]
                edges_i.append(a)
                edges_j.append(b)
                rels.append(poses[a] @ np.linalg.inv(poses[b]))
                ws.append(1.0)
                tree_pairs.add((min(a, b), max(a, b)))
        for a in range(K - 1):
            if (a, a + 1) in tree_pairs:
                continue
            edges_i.append(a)
            edges_j.append(a + 1)
            rels.append(poses[a] @ np.linalg.inv(poses[a + 1]))
            ws.append(1.0)
        # Covisibility edges.
        for i_id, j_id, w in covis_edges:
            if i_id in id_index and j_id in id_index:
                a, b = id_index[i_id], id_index[j_id]
                edges_i.append(a)
                edges_j.append(b)
                rels.append(poses[a] @ np.linalg.inv(poses[b]))
                ws.append(min(w / 100.0, 1.0))
        # Loop edge: corrected query pose = S_q ∘ S_corr^{-1}
        # (points move x -> S_corr x, so camera-from-world absorbs inverse).
        qa = id_index[query_kf_id]
        mb = id_index[match_kf_id]
        s_corr, R_corr, t_corr = _sim3_from_mat(T_corr)
        scale_active = (not self.fix_scale) and abs(np.log(s_corr)) > 1e-6

        fixed = np.zeros(K, bool)
        fixed[mb] = True
        fixed[0] = True

        if not scale_active:
            T_query_corrected = poses[qa] @ np.linalg.inv(T_corr)
            rel_loop = T_query_corrected @ np.linalg.inv(poses[mb])
            edges_i.append(qa)
            edges_j.append(mb)
            rels.append(rel_loop)
            ws.append(5.0)
            new_poses = pose_graph_optimization(
                jnp.asarray(poses),
                jnp.asarray(np.array(edges_i, np.int32)),
                jnp.asarray(np.array(edges_j, np.int32)),
                jnp.asarray(np.stack(rels).astype(np.float32)),
                jnp.asarray(np.array(ws, np.float32)),
                jnp.asarray(fixed),
                iters=50,
            )
            new_poses = np.asarray(new_poses)
            return (
                {kf.kf_id: new_poses[i] for i, kf in enumerate(keyframes)},
                None,
            )

        # 7-DoF path (monocular): odometry/covis edges carry relative scale
        # 1; the loop edge carries the verified drift scale.
        S_q = (1.0, poses[qa][:3, :3], poses[qa][:3, 3])
        S_qc = _sim3_compose(S_q, _sim3_inv((s_corr, R_corr, t_corr)))
        S_m_inv = _sim3_inv((1.0, poses[mb][:3, :3], poses[mb][:3, 3]))
        s_rel, R_rel, t_rel = _sim3_compose(S_qc, S_m_inv)
        rel_loop = np.eye(4, dtype=np.float32)
        rel_loop[:3, :3] = R_rel
        rel_loop[:3, 3] = t_rel
        edges_i.append(qa)
        edges_j.append(mb)
        rels.append(rel_loop)
        ws.append(5.0)
        rel_ls = np.zeros(len(rels), np.float32)
        rel_ls[-1] = np.log(s_rel)

        from gsorb_slam_tpu.frontend.ba import sim3_pose_graph_optimization

        new_poses, new_ls = sim3_pose_graph_optimization(
            jnp.asarray(poses),
            jnp.zeros(K, jnp.float32),
            jnp.asarray(np.array(edges_i, np.int32)),
            jnp.asarray(np.array(edges_j, np.int32)),
            jnp.asarray(np.stack(rels).astype(np.float32)),
            jnp.asarray(rel_ls),
            jnp.asarray(np.array(ws, np.float32)),
            jnp.asarray(fixed),
            iters=50,
        )
        new_poses = np.asarray(new_poses)
        new_s = np.exp(np.asarray(new_ls))
        out_poses, point_corr = {}, {}
        for i, kf in enumerate(keyframes):
            Ri = new_poses[i][:3, :3]
            ti = new_poses[i][:3, 3]
            si = float(new_s[i])
            # Metric pose: T = [R, t/s] (g2o::Sim3 -> SE3, Converter).
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Ri
            T[:3, 3] = ti / si
            out_poses[kf.kf_id] = T
            # Old-world -> corrected-world point map: S_new^{-1} ∘ S_old.
            S_old = (1.0, poses[i][:3, :3].copy(), poses[i][:3, 3].copy())
            S_new = (si, Ri, ti)
            point_corr[kf.kf_id] = _sim3_mat(
                _sim3_compose(_sim3_inv(S_new), S_old)
            )
        return out_poses, point_corr
