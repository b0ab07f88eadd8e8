"""Offline map viewer: render flythroughs / novel views from a saved model.

The TPU-era stand-in for the reference's Pangolin / GLFW+ImGui viewers
(``src/Viewer.cc``, ``src/Viewer2.cc``): instead of an OpenGL loop on the
SLAM machine, render any pose server-side with the TPU rasterizer
(``Render::Viwer`` semantics, ``src/Render.cc:179-193``) and write
PNG frames / an orbit video that any client can display.

Usage:
    python -m gsorb_slam_tpu.apps.viewer --ply out/GaussianModel.ply \
        --config cfg.yaml --mode orbit --frames 60 --out viewer_out/
    python -m gsorb_slam_tpu.apps.viewer --ply ... --traj traj.txt --mode replay
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--mode", default="orbit", choices=["orbit", "replay"])
    ap.add_argument("--traj", default=None, help="trajectory for replay mode")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--radius", type=float, default=0.5)
    ap.add_argument("--out", default="viewer_out")
    ap.add_argument("--stride", type=int, default=1)
    args = ap.parse_args(argv)

    import numpy as np
    import jax.numpy as jnp

    from gsorb_slam_tpu.core.camera import Camera
    from gsorb_slam_tpu.core.config import load_config
    from gsorb_slam_tpu.eval.ply import load_gaussian_ply
    from gsorb_slam_tpu.raster import RasterConfig, render

    cfg = load_config(args.config)
    cam = Camera(
        fx=cfg.camera.fx, fy=cfg.camera.fy, cx=cfg.camera.cx, cy=cfg.camera.cy,
        width=cfg.camera.width, height=cfg.camera.height,
    )
    model = load_gaussian_ply(args.ply)
    params = {k: jnp.asarray(v) for k, v in model.items()}
    n = len(model["means"])
    active = jnp.ones(n, bool)
    rcfg = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=128)
    os.makedirs(args.out, exist_ok=True)

    if args.mode == "replay":
        from gsorb_slam_tpu.eval.trajectory import load_tum

        poses = [T for _, T in load_tum(args.traj)][:: args.stride]
    else:
        # Orbit around the map centroid at the mean viewing distance.
        center = np.asarray(model["means"]).mean(axis=0)
        poses = []
        for i in range(args.frames):
            ang = 2 * np.pi * i / args.frames
            offset = np.array(
                [args.radius * np.sin(ang), 0.0, -args.radius * np.cos(ang)]
            )
            eye = center + offset - np.array([0, 0, np.linalg.norm(center) or 2.0])
            fwd = center - eye
            fwd = fwd / np.linalg.norm(fwd)
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            up2 = np.cross(fwd, right)
            R_wc = np.stack([right, up2, fwd], axis=1)
            T_cw = np.eye(4, dtype=np.float32)
            T_cw[:3, :3] = R_wc.T
            T_cw[:3, 3] = -R_wc.T @ eye
            poses.append(T_cw)

    def save_png(path, img):
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        try:
            import cv2

            cv2.imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
        except Exception:
            from PIL import Image

            Image.fromarray(arr).save(path)

    for i, T_cw in enumerate(poses):
        out = render(
            params["means"], params["rgb"], params["quats"],
            params["logit_opacities"], params["log_scales"], active,
            jnp.asarray(T_cw), cam, rcfg,
        )
        save_png(os.path.join(args.out, f"view_{i:04d}.png"), np.asarray(out.color))
        if i % 10 == 0:
            print(f"rendered {i + 1}/{len(poses)}")
    print(f"wrote {len(poses)} frames to {args.out}/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
