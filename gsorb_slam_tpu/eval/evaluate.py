"""Sequence evaluation: render every estimated pose and score against GT.

Equivalent of the reference's in-process ``Evalution`` (``src/Utils.cc:
365-473``: re-render each frame at its estimated pose, PSNR/SSIM/MS-SSIM/
LPIPS + depth L1) and the ATE hook (``scripts/tum_ate.py`` forked from
``Examples/RGB-D/rgbd_tum.cc:170-188``).
"""

from __future__ import annotations

import numpy as np

from gsorb_slam_tpu.eval.ate import ate_rmse
from gsorb_slam_tpu.ops import metrics as MM


def evaluate_sequence(
    system,
    dataset,
    stride: int = 1,
    compute_lpips: bool = False,
) -> dict:
    """Render every ``stride``-th frame at its ESTIMATED pose and score
    (stride=1 scores every frame, matching the reference Evalution
    src/Utils.cc:365-473; raise it only for smoke runs)
    against the sensor images; ATE against GT when available."""
    import jax.numpy as jnp

    psnrs, ssims, msssims, lpipss, dl1s = [], [], [], [], []
    est, gt = [], []
    for rec in system.trajectory:
        est.append(rec.T_cw)
    for i, fr in enumerate(dataset):
        if i >= len(est):
            break
        if fr.gt_T_cw is not None:
            gt.append((i, fr.gt_T_cw))
        if i % stride != 0:
            continue
        out = system.render_view(est[i])
        pred = np.clip(np.asarray(out.color), 0, 1)
        target = np.asarray(fr.rgb, np.float32)
        mask = fr.depth > 0
        psnrs.append(float(MM.psnr(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))))
        from gsorb_slam_tpu.ops.losses import ssim as _ssim

        ssims.append(float(_ssim(jnp.asarray(pred), jnp.asarray(target))))
        if min(pred.shape[:2]) >= 176:
            msssims.append(float(MM.ms_ssim(jnp.asarray(pred), jnp.asarray(target))))
        if compute_lpips:
            lpipss.append(MM.lpips(pred, target))
        med = np.asarray(out.median_depth)
        dl1s.append(
            float(
                MM.depth_l1(jnp.asarray(med), jnp.asarray(fr.depth), jnp.asarray(mask))
            )
        )

    result = {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "ms_ssim": float(np.mean(msssims)) if msssims else float("nan"),
        "lpips": float(np.nanmean(lpipss)) if lpipss else float("nan"),
        "depth_l1": float(np.mean(dl1s)) if dl1s else float("nan"),
        "n_eval_frames": len(psnrs),
    }
    if len(gt) >= 3:
        idxs = [i for i, _ in gt]
        result["ate_rmse"] = ate_rmse(
            [est[i] for i in idxs], [T for _, T in gt]
        )
    return result
