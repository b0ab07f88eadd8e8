"""Diagnose the loop-closing pipeline on the revisit trajectory: per-KF
BoW retrieval scores, consistency streaks, verify inlier counts.

Mirrors tests/test_loop_e2e.py exactly (injected drifted poses).
"""

import os

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import (
    CameraConfig, MappingConfig, ORBConfig, SystemConfig, TrackingConfig,
)
from gsorb_slam_tpu.frontend.vocab import default_vocabulary
from gsorb_slam_tpu.raster import RasterConfig
from gsorb_slam_tpu.slam.dataset import SyntheticDataset
from gsorb_slam_tpu.slam.system import System


def trajectory():
    xs = list(np.arange(0.0, 1.6, 0.2)) + [1.1, 0.7, 0.35, 0.1]
    xs += [0.015, 0.0, 0.012, 0.005]
    poses = []
    for i, x in enumerate(xs):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -x
        T[1, 3] = 0.01 * np.sin(i)
        poses.append(T)
    return poses


def drift(i: int) -> np.ndarray:
    ang = 0.003 * i
    ca, sa = np.cos(ang), np.sin(ang)
    T = np.eye(4, dtype=np.float32)
    T[0, 0], T[0, 2] = ca, sa
    T[2, 0], T[2, 2] = -sa, ca
    T[0, 3] = 0.009 * i
    T[1, 3] = 0.003 * i
    return T


def main():
    vocab = default_vocabulary()
    cam = Camera(fx=90.0, fy=90.0, cx=48.0, cy=36.0, width=96, height=72)
    cfg = SystemConfig(
        camera=CameraConfig(width=96, height=72, fx=90.0, fy=90.0, cx=48.0,
                            cy=36.0, fps=10),
        orb=ORBConfig(n_features=300, n_levels=3),
        mapping=MappingConfig(num_iters=8, init_iters=10, max_gaussians=16384,
                              window_size=3, covis_window=2),
        tracking=TrackingConfig(num_iters=4, lost_num_iters=4),
    )
    traj = trajectory()
    ds = SyntheticDataset(cam, n_splats=3000, seed=5, trajectory=traj)
    rcfg = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=128,
                        dilate_px=8.0)
    sys_ = System(cfg, max_keyframes=32, raster=rcfg, frontend="orb",
                  vocabulary=vocab)
    sys_.loop_closer.min_gap = 8
    sys_.loop_closer.min_inliers = 12
    sys_.max_frames_between_kf = 1

    # instrument detect
    lc = sys_.loop_closer
    orig_detect = lc.detect

    def detect(kf, recent):
        cands = lc.db.query(kf.kf_id, recent, lc.min_score)
        print(f"  KF {kf.kf_id}: recent={sorted(recent)} "
              f"cands={[(c, round(s, 3)) for c, s in cands[:5]]} "
              f"consistency={lc.consistency}", flush=True)
        return orig_detect(kf, recent)

    lc.detect = detect
    orig_verify = lc.verify

    def verify(q, m, fe, cam=None):
        r = orig_verify(q, m, fe, cam=cam, debug=True)
        print(f"  VERIFY q={q.kf_id} m={m.kf_id} -> "
              f"{'OK' if r is not None else 'FAIL'}", flush=True)
        return r

    lc.verify = verify

    import time
    for i, fr in enumerate(ds):
        t0 = time.time()
        T_inj = (fr.gt_T_cw @ np.linalg.inv(drift(i))).astype(np.float32)
        sys_.track_rgbd(fr.rgb, fr.depth, fr.timestamp, gt_pose=T_inj)
        print(f"frame {i} ({time.time()-t0:.1f}s) "
              f"kfs={len(sys_.fe.keyframes)} loops={sys_.loop_events}",
              flush=True)

    print("keyframes:", [(kf.kf_id, kf.frame_id) for kf in sys_.fe.keyframes])
    print("loop_events:", sys_.loop_events)

    # Post-run probe: why is KF0 never retrieved for the dwell KFs?
    from gsorb_slam_tpu.frontend.matcher import hamming_matrix, search_by_bow

    kfs = {kf.kf_id: kf for kf in sys_.fe.keyframes}
    lcdb = sys_.loop_closer.db
    for q, m in [(12, 0), (12, 1), (13, 0), (14, 0)]:
        if q not in kfs or m not in kfs:
            continue
        kq, km = kfs[q], kfs[m]
        bq, bm = lcdb.bows.get(q, {}), lcdb.bows.get(m, {})
        shared = set(bq) & set(bm)
        from gsorb_slam_tpu.frontend.vocab import score_l1
        D = np.asarray(
            hamming_matrix(kq.feats.descriptors, km.feats.descriptors)
        )
        vq = np.asarray(kq.feats.valid)
        vm = np.asarray(km.feats.valid)
        D = D[vq][:, vm]
        best = D.min(axis=1)
        _w1, _t1, n1 = lcdb.vocab.transform_with_nodes(
            kq.feats.descriptors, kq.feats.valid
        )
        _w2, _t2, n2 = lcdb.vocab.transform_with_nodes(
            km.feats.descriptors, km.feats.valid
        )
        sbb = search_by_bow(kq.feats, km.feats, n1, n2, max_dist=64)
        print(
            f"probe {q}vs{m}: nvalid=({int(vq.sum())},{int(vm.sum())}) "
            f"words=({len(bq)},{len(bm)}) shared={len(shared)} "
            f"score={score_l1(bq, bm):.3f} "
            f"bf_matches<=50={int((best <= 50).sum())} "
            f"bf<=64={int((best <= 64).sum())} "
            f"sbb={int(np.asarray(sbb.valid).sum())}",
            flush=True,
        )


if __name__ == "__main__":
    main()
