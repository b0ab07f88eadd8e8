"""Headline benchmark: render+backward throughput on a TUM-like workload.

Measures full tracking iterations/sec (one differentiable rasterization of a
640x480 view of an ~250k-splat map + loss + backward + pose Adam step) on
the attached accelerator — the compute envelope of the reference's
``RenderStartTraking`` inner loop (``src/Render.cc:1040-1120``;
BASELINE.md: each reference tracking iter = 2 CUDA rasterizations + 1
backward; ours emits all channels in ONE pass).

Baseline: the reference publishes no numbers (BASELINE.md); the CUDA
rasterizer on the reference's sm_89 hardware sustains ~250 render+backward
iterations/sec at this workload (VGA, 10^5.4 splats — consistent with
published 3DGS-SLAM timing tables). vs_baseline = ours / 250.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def _smoke_gate() -> bool | None:
    """Run scripts/tpu_smoke.py (compiled-vs-XLA math parity) in a SEPARATE
    process BEFORE this one attaches the TPU (one productive TPU process at
    a time). Defends the headline number against the r1/r2 bug class:
    Mosaic/MXU divergence that CPU interpret tests cannot see.

    Returns True (pass), False (fail), or None (no TPU -> skipped)."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    # The subprocess must be able to import gsorb_slam_tpu regardless of the
    # caller's PYTHONPATH (a clobbered PYTHONPATH once turned an import error
    # into a silent math_ok=false).
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    try:
        res = subprocess.run(
            [sys.executable, os.path.join(here, "scripts", "tpu_smoke.py")],
            capture_output=True, text=True, timeout=2400, cwd=here, env=env,
        )
    except Exception as e:  # timeout/crash = loud failure, not a silent skip
        print(f"# tpu_smoke gate ERROR: {e}", flush=True)
        return False
    tail = (res.stdout or "").strip().splitlines()
    for line in tail[-20:]:
        print(f"# smoke: {line}", flush=True)
    if res.returncode != 0:
        for line in (res.stderr or "").strip().splitlines()[-10:]:
            print(f"# smoke STDERR: {line}", flush=True)
    if "SKIP: no TPU backend" in res.stdout:
        return None
    return res.returncode == 0 and "TPU-SMOKE PASS" in res.stdout


def main() -> None:
    math_ok = _smoke_gate()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gsorb_slam_tpu.core.camera import Camera
    from gsorb_slam_tpu.core.config import TrackingConfig
    from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
    from gsorb_slam_tpu.slam.tracking import FeatureMatches, track_frame
    from gsorb_slam_tpu.splat.gaussians import empty_map, add_points

    W, H = 640, 480
    N = 250_000
    CAP = 1 << 18
    # Reference TUM tracking budget (Examples/RGB-D/tum/TUM1.yaml:109): the
    # timed loop pays the SAME per-frame costs a production frame does —
    # including the in-loop rebin episodes, amortized at their true 200-iter
    # cadence (8/40/120), not at a shortened loop's.
    ITERS = 200

    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    # Production System defaults (slam/system.py): dilate 2 with the
    # budget-adaptive in-loop rebin cadence (8/40/120 at 200 iters) — the
    # timed loop INCLUDES the rebin cost, exactly as a production frame
    # pays it.
    # Production TRACKING raster view (System.default_raster_config with
    # track_tile_capacity applied): the tracking pack/preprocess are dense
    # over tile capacity, so tracking bins at 1024 while mapping/eval bin at
    # 2048 (the r4 depth-quality fix).
    rcfg = RasterConfig(
        # r5 sweep: tracking cap 512 (dense pack/preprocess halve) + B=4
        # (per-grid-step amortization) = 143.5 -> 159.0 it/s
        tile=16, tile_capacity=512, max_dup=16,
        chunk=256, chunk_unroll=2, fused_tiles_per_step=4,
        dilate_px=2.0,
        exact_stop=False,  # production default (deviation <= 1e-4)
        blend_bf16=True,  # r4 quality twin: bf16 >= f32 on every metric
        # elem16 production default (r4g): bf16 slab scratch halves the
        # phase-A->B VMEM traffic — 143.3 vs 122.6 it/s, quality twin
        # within noise. GSORB_BENCH_ELEM16=0 A/Bs it off.
        elem_bf16=__import__("os").environ.get("GSORB_BENCH_ELEM16", "1") == "1",
    )
    tcfg = TrackingConfig(num_iters=ITERS, early_stop_delta=0.0)

    rng = np.random.default_rng(0)
    means = np.stack(
        [rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(0.8, 4.0, N)], -1
    ).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(
        gm,
        jnp.asarray(means),
        jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
        jnp.asarray(means[:, 2]),
        jnp.ones(N, bool),
        cam.fx,
        cam.fy,
    )

    T_gt = jnp.eye(4)
    prep = preprocess(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, T_gt, cam,
    )
    bins = bin_gaussians(prep, cam, rcfg)

    # Synthetic GT: render once from the map itself.
    from gsorb_slam_tpu.raster.tiled import render_tiled

    out = jax.jit(lambda p: render_tiled(p, bins, cam, rcfg))(prep)
    gt_color = jax.lax.stop_gradient(out.color)
    gt_depth = jax.lax.stop_gradient(
        jnp.where(out.alpha > 0.5, out.median_depth, 0.0)
    )

    T_init = jnp.eye(4).at[:3, 3].set(jnp.array([0.01, -0.005, 0.008]))
    run = jax.jit(
        lambda gm, T0: track_frame(
            gm, T0, gt_color, gt_depth, FeatureMatches.empty(), cam, tcfg, rcfg,
            num_iters=ITERS, bins=bins,
        ).T_cw
    )
    jax.block_until_ready(run(gm, T_init))  # compile
    reps = 3
    best = float("inf")
    for rep in range(reps):
        # distinct input per rep: identical (executable, inputs) pairs can
        # be served from a result cache by the remote execution layer.
        T_r = T_init.at[0, 3].add(1e-5 * (rep + 1))
        jax.block_until_ready(T_r)
        t0 = time.perf_counter()
        jax.block_until_ready(run(gm, T_r))
        dt = time.perf_counter() - t0
        print(f"# rep {rep}: {dt*1e3:.1f} ms", flush=True)
        best = min(best, dt)
    iters_per_sec = ITERS / best

    # Multi-chip: when the attached accelerator exposes >1 device, track
    # with the tile-sharded path (parallel/tracking.py — one 7-dof psum per
    # iteration over ICI) and report the better number. No-op single-chip.
    n_dev = len(jax.devices())
    mesh_track_ips = None
    if n_dev > 1:
        from gsorb_slam_tpu.parallel.mesh import make_mesh
        from gsorb_slam_tpu.parallel.tracking import parallel_track_frame

        mesh = make_mesh(n_dev)
        prun = jax.jit(
            lambda gm, T0: parallel_track_frame(
                gm, T0, gt_color, gt_depth, FeatureMatches.empty(), cam,
                tcfg, rcfg, mesh, num_iters=ITERS,
            ).T_cw
        )
        jax.block_until_ready(prun(gm, T_init))
        best_p = float("inf")
        for rep in range(reps):
            T_r = T_init.at[0, 3].add(1e-5 * (rep + 1))
            jax.block_until_ready(T_r)
            t0 = time.perf_counter()
            jax.block_until_ready(prun(gm, T_r))
            best_p = min(best_p, time.perf_counter() - t0)
        mesh_track_ips = ITERS / best_p
        print(f"# mesh({n_dev}) tracking: {mesh_track_ips:.1f} it/s", flush=True)
        iters_per_sec = max(iters_per_sec, mesh_track_ips)

    # Secondary metric: mapping (splat-parameter) optimization iterations —
    # the full map_window step: pack gather + blend fwd/bwd + per-Gaussian
    # scatter-add + masked Adam, the envelope of Render::RenderForFrame
    # (src/Render.cc:402-493).
    from gsorb_slam_tpu.core.config import MappingConfig
    from gsorb_slam_tpu.slam.mapping import WindowFrames, map_window

    mcfg = MappingConfig()
    MAP_ITERS = 20
    # Production mapping bins at the FULL tile_capacity (2048; the r4
    # depth-quality fix) — rebin for the mapping metric.
    import dataclasses as _dc

    rcfg_m = _dc.replace(rcfg, tile_capacity=2048)
    bins_m = jax.jit(lambda p: bin_gaussians(p, cam, rcfg_m))(prep)
    frames = WindowFrames(
        colors=gt_color[None],
        depths=gt_depth[None],
        poses=T_gt[None],
        bins_indices=bins_m.indices[None],
        bins_counts=bins_m.counts[None],
        n_frames=jnp.asarray(1, jnp.int32),
    )
    K = rcfg_m.chunk
    nch = int(jnp.sum((bins_m.counts + K - 1) // K))
    budget = max(-(-(nch + 64) // 1024) * 1024, 1024)
    map_run = jax.jit(
        lambda gm, key: map_window(
            gm, frames, key, cam, mcfg, rcfg_m, num_iters=MAP_ITERS,
            chunk_budget=budget,
        )[0].means
    )
    jax.block_until_ready(map_run(gm, jax.random.PRNGKey(0)))
    best_m = float("inf")
    for rep in range(reps):
        key = jax.random.PRNGKey(rep + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(map_run(gm, key))
        best_m = min(best_m, time.perf_counter() - t0)
    map_iters_per_sec = MAP_ITERS / best_m

    mesh_ips = _mesh_bench()

    # Baseline provenance: the reference repo publishes NO numbers
    # (BASELINE.md); 250 it/s is an ESTIMATE of the CUDA rasterizer's
    # render+backward rate on the author's sm_89 hardware at this workload,
    # from published 3DGS-SLAM timing tables — not a measurement.
    baseline = 250.0
    out = {
        "metric": "tracking_render_backward_iters_per_sec_vga_250k",
        "value": round(iters_per_sec, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / baseline, 3),
        "baseline_provenance": "estimate_sm89_3dgs_timing_tables",
        "math_ok": math_ok,
        "mapping_iters_per_sec": round(map_iters_per_sec, 2),
        "n_devices": n_dev,
    }
    if mesh_track_ips is not None:
        out["tracking_mesh_iters_per_sec"] = round(mesh_track_ips, 2)
    if mesh_ips is not None:
        out["mesh8_map_steps_per_sec_cpu"] = round(mesh_ips, 2)
    print(json.dumps(out))


def _mesh_bench() -> float | None:
    """Data-parallel mapping steps/sec on an 8-virtual-device CPU mesh, in a
    subprocess (the parent process is latched to the TPU platform). Small
    scene — this validates the sharded step end to end, not absolute speed.
    """
    import os
    import subprocess
    import sys

    code = r"""
import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb")
import jax.numpy as jnp, numpy as np
from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.core.config import MappingConfig
from gsorb_slam_tpu.parallel.mesh import make_mesh, parallel_window_step, replicate_map, shard_frames
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.slam.mapping import WindowFrames
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map
cam = Camera(fx=90.0, fy=90.0, cx=48.0, cy=36.0, width=96, height=72)
rcfg = RasterConfig(tile=16, tile_capacity=256, max_dup=16, chunk=64)
mcfg = MappingConfig()
rng = np.random.default_rng(0)
N = 3000
means = np.stack([rng.uniform(-1,1,N), rng.uniform(-0.8,0.8,N), rng.uniform(1,3,N)], -1).astype(np.float32)
gm = empty_map(1 << 12)
gm = add_points(gm, jnp.asarray(means), jnp.asarray(rng.uniform(0,1,(N,3)).astype(np.float32)),
                jnp.asarray(means[:,2]), jnp.ones(N, bool), cam.fx, cam.fy)
poses, bi, bc, cols, deps = [], [], [], [], []
for i in range(8):
    T = jnp.eye(4).at[0, 3].set(0.01 * i)
    p = preprocess(gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales, gm.active, T, cam)
    b = bin_gaussians(p, cam, rcfg)
    from gsorb_slam_tpu.raster.tiled import render_tiled
    o = render_tiled(p, b, cam, rcfg)
    poses.append(T); bi.append(b.indices); bc.append(b.counts)
    cols.append(o.color); deps.append(jnp.where(o.alpha > 0.5, o.median_depth, 0.0))
frames = WindowFrames(colors=jnp.stack(cols), depths=jnp.stack(deps), poses=jnp.stack(poses),
                      bins_indices=jnp.stack(bi), bins_counts=jnp.stack(bc),
                      n_frames=jnp.asarray(8, jnp.int32))
mesh = make_mesh(8)
gmr = replicate_map(gm, mesh)
fr = shard_frames(frames, mesh)
step = jax.jit(lambda g, f, i: parallel_window_step(g, f, mesh, cam, mcfg, rcfg, local_idx=i))
g2, _ = step(gmr, fr, jnp.asarray(0, jnp.int32))
jax.block_until_ready(g2.means)
t0 = time.perf_counter(); n = 10
for i in range(n):
    g2, _ = step(g2, fr, jnp.asarray(i, jnp.int32))
jax.block_until_ready(g2.means)
print(n / (time.perf_counter() - t0))
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=900, env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return float(res.stdout.strip().splitlines()[-1])
    except Exception:
        return None


if __name__ == "__main__":
    main()
