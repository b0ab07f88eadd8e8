"""Host-cost attribution for the ORB frontend + keyframe chain.

Drives GeometricFrontend.process_frame + create_keyframe over a synthetic
TUMLike sequence and prints (a) the fe.*/kf.* phase wall-time accumulators
and (b) cProfile's top cumulative functions — the measurement behind the
r4 "cut host per-frame cost 10x" work (reference bar: the whole ORB
front-end runs in ~15 ms, ``src/ORBextractor.cc``).

Runs on CPU by default (JAX_PLATFORMS latched by sitecustomize is
overridden in-process) so it never contends with a TPU job; pass --tpu to
measure the tunnel-dispatch cost the e2e runs actually pay.
"""

import argparse
import cProfile
import io
import pstats
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--kf-every", type=int, default=1,
                    help="create a keyframe every N frames (e2e: ~1)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gsorb_slam_tpu.core.camera import Distortion
    from gsorb_slam_tpu.slam.dataset import TUMLikeDataset
    from gsorb_slam_tpu.slam.geometric import GeometricFrontend

    ds = TUMLikeDataset(
        n_frames=args.frames, width=args.width, height=args.height,
        apply_distortion=True, cache_dir="/tmp/gsorb_bench_cache",
    )
    k1, k2, p1, p2, k3 = TUMLikeDataset.DIST
    fe = GeometricFrontend(
        ds.cam, dist=Distortion(k1=k1, k2=k2, p1=p1, p2=p2, k3=k3)
    )

    def gray(fr):
        return (0.299 * fr.rgb[..., 0] + 0.587 * fr.rgb[..., 1]
                + 0.114 * fr.rgb[..., 2]).astype(np.float32)

    # Warm-up frame 0: extraction compile + first KF.
    fr0 = ds[0]
    g0 = gray(fr0)
    t_c = time.perf_counter()
    feats0 = fe._extract(g0)
    print(f"extract compile+first call: {time.perf_counter() - t_c:.2f}s",
          flush=True)
    fe.create_keyframe(feats0, fr0.depth, fr0.gt_T_cw, 0)
    fe.timings.clear()

    prof = cProfile.Profile()
    t_all = time.perf_counter()
    prof.enable()
    for i in range(1, len(ds)):
        fr = ds[i]
        res = fe.process_frame(gray(fr), fr.gt_T_cw)
        if i % args.kf_every == 0:
            fe.create_keyframe(res.feats, fr.depth, fr.gt_T_cw, i)
    prof.disable()
    wall = time.perf_counter() - t_all
    n = len(ds) - 1

    print(f"\n== {n} frames, {wall:.2f}s total, {wall / n * 1e3:.0f} ms/frame "
          f"(backend={jax.default_backend()}) ==")
    print("-- phase accumulators (s total | ms/frame) --")
    for k, v in sorted(fe.timings.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<18} {v:8.3f}  {v / n * 1e3:8.1f}")
    other = wall - sum(fe.timings.values())
    print(f"  {'(unattributed)':<18} {other:8.3f}  {other / n * 1e3:8.1f}")

    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(args.top)
    print(s.getvalue())
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
