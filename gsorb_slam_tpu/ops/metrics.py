"""Image/depth quality metrics.

Equivalents of the reference's evaluation metrics: PSNR
(``src/Utils.cc:33-37``), SSIM (``src/Utils.cc:81-120``), MS-SSIM and LPIPS
(TorchScript modules traced by ``scripts/gen_eval_model.py``, consumed in
``src/Utils.cc:365-473`` and ``scripts/replay.py:339-341``), and the
median-depth L1 (``scripts/replay.py:333-336``). PSNR/SSIM/MS-SSIM/depth-L1
are pure JAX; LPIPS needs pretrained AlexNet weights, so it is gated behind
an optional torch path and reports NaN when the weights are unavailable.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp

from gsorb_slam_tpu.ops.losses import _depthwise_blur, ssim


def psnr(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Peak signal-to-noise ratio over ``[H, W, C]`` images in [0, 1].

    The reference masks evaluation pixels by valid depth
    (``src/Utils.cc:419-431``); pass that as ``mask`` ``[H, W]``.
    """
    err = (pred - target) ** 2
    if mask is None:
        mse = jnp.mean(err)
    else:
        m = jnp.broadcast_to(mask.astype(err.dtype)[..., None], err.shape)
        mse = jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool2(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    x = img[:h, :w]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])


def ms_ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """5-scale MS-SSIM (Wang et al. 2003) over ``[H, W, C]`` in [0, 1].

    Pure-JAX stand-in for the reference's TorchScript pytorch-msssim module
    (``scripts/gen_eval_model.py:18-23``); same standard weights.
    """
    levels = len(_MSSSIM_WEIGHTS)
    mcs = []
    p, t = pred, target
    value = jnp.asarray(1.0, pred.dtype)
    for i in range(levels):
        blur = lambda x: _depthwise_blur(x, window_size, sigma)
        mu_p, mu_t = blur(p), blur(t)
        var_p = blur(p * p) - mu_p**2
        var_t = blur(t * t) - mu_t**2
        cov = blur(p * t) - mu_p * mu_t
        cs = jnp.mean((2 * cov + c2) / (var_p + var_t + c2))
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            p, t = _avg_pool2(p), _avg_pool2(t)
        else:
            lum = jnp.mean(
                (2 * mu_p * mu_t + c1) / (mu_p**2 + mu_t**2 + c1)
            )
            value = jnp.maximum(lum * cs, 0.0) ** _MSSSIM_WEIGHTS[-1]
    for w, cs in zip(_MSSSIM_WEIGHTS[:-1], mcs):
        value = value * cs**w
    return value


def depth_l1(
    pred_depth: jnp.ndarray, gt_depth: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Mean |pred - gt| over valid-depth pixels (``scripts/replay.py:333-336``)."""
    if mask is None:
        mask = gt_depth > 0
    m = mask.astype(pred_depth.dtype)
    return jnp.sum(jnp.abs(pred_depth - gt_depth) * m) / jnp.maximum(jnp.sum(m), 1.0)


_LPIPS_MODEL = None
_LPIPS_FAILED = False


def lpips(pred: jnp.ndarray, target: jnp.ndarray) -> float:
    """LPIPS (AlexNet). Prefers the pure-JAX implementation with locally
    exported weights (``ops/lpips_jax.py``; export once with
    ``scripts/export_lpips_weights.py`` on a machine with egress), falls
    back to torchmetrics if installed, else returns NaN once with a
    warning."""
    global _LPIPS_MODEL, _LPIPS_FAILED
    if _LPIPS_FAILED:
        return float("nan")
    if _LPIPS_MODEL is None:
        from gsorb_slam_tpu.ops import lpips_jax as LJ

        wpath = LJ.default_weights_path()
        if wpath is not None:
            _LPIPS_MODEL = ("jax", LJ.load_lpips_weights(wpath))
    if _LPIPS_MODEL is not None and isinstance(_LPIPS_MODEL, tuple):
        from gsorb_slam_tpu.ops import lpips_jax as LJ

        return float(
            LJ.lpips_pair(
                jnp.asarray(pred, jnp.float32), jnp.asarray(target, jnp.float32),
                _LPIPS_MODEL[1],
            )
        )
    if _LPIPS_MODEL is None:
        try:
            import torch  # noqa: F401
            from torchmetrics.image.lpip import (
                LearnedPerceptualImagePatchSimilarity,
            )

            _LPIPS_MODEL = LearnedPerceptualImagePatchSimilarity(
                net_type="alex", normalize=True
            )
        except Exception as e:  # pragma: no cover - environment dependent
            warnings.warn(f"LPIPS unavailable ({e}); reporting NaN")
            _LPIPS_FAILED = True
            return float("nan")
    import numpy as np
    import torch

    to_t = lambda x: torch.from_numpy(np.asarray(x, dtype=np.float32)).permute(2, 0, 1)[None]
    with torch.no_grad():
        return float(_LPIPS_MODEL(to_t(pred), to_t(target)))


__all__ = ["psnr", "ssim", "ms_ssim", "depth_l1", "lpips"]


def truncation_weight_report(prep, cam, cfg, oracle_capacity: int) -> dict:
    """Blended-WEIGHT effect of tile_capacity truncation (r4 verdict item
    7): render the same preprocessed scene at the production capacity and
    at ``oracle_capacity`` (large enough to drop nothing) and report the
    fraction of accumulated opacity / color the truncation actually
    removed. Bins keep the NEAREST ``tile_capacity`` instances per tile
    (depth-sorted), so dropped instances are the farthest — occluded
    wherever the kept prefix saturates; the instance-count drop fraction
    (``bin_dropped_frac``) wildly overstates the visible effect. Reference:
    the CUDA pipeline's dynamic tile ranges never drop
    (``rasterizer_impl.cu:117-139``).
    """
    import dataclasses

    import jax.numpy as jnp

    from gsorb_slam_tpu.raster.binning import bin_gaussians
    from gsorb_slam_tpu.raster.tiled import render_tiled

    cfg_o = dataclasses.replace(cfg, tile_capacity=int(oracle_capacity))
    bins_t = bin_gaussians(prep, cam, cfg)
    bins_o = bin_gaussians(prep, cam, cfg_o)
    out_t = render_tiled(prep, bins_t, cam, cfg)
    out_o = render_tiled(prep, bins_o, cam, cfg_o)
    alpha_o_sum = float(jnp.sum(out_o.alpha))
    inst_total = float(jnp.sum(bins_o.counts))
    return {
        "inst_dropped_frac": float(bins_t.n_dropped) / max(inst_total, 1.0),
        "oracle_dropped": int(bins_o.n_dropped),  # must be 0 for a valid oracle
        "weight_dropped_frac": float(
            jnp.sum(jnp.abs(out_o.alpha - out_t.alpha))
        ) / max(alpha_o_sum, 1e-9),
        "color_l1_frac": float(
            jnp.sum(jnp.abs(out_o.color - out_t.color))
        ) / max(float(jnp.sum(jnp.abs(out_o.color))), 1e-9),
        "depth_l1_mean_m": float(
            jnp.mean(jnp.abs(out_o.depth - out_t.depth))
        ),
    }
