"""Photometric losses.

TPU-native equivalents of the reference's loss kit (``src/Utils.cc:33-120``):
L1 variants with the same reduction semantics (mean for mapping, sum for
tracking, masked variants), the 11x11 Gaussian-window SSIM, and the combined
mapping loss ``lambda * L1 + (1 - lambda) * (1 - SSIM)``.

Image convention: channels-last ``[H, W, C]`` float32 in ``[0, 1]`` (TPU lane
dimension = W after vectorization; channels-last keeps the SSIM convolutions
depthwise and XLA-fusable). Depth maps are ``[H, W]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_mapping(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean absolute error; masked mean if ``mask`` given.

    Matches ``L1LossForMapping`` (``src/Utils.cc:39-45``).
    """
    diff = jnp.abs(pred - target)
    if mask is None:
        return jnp.mean(diff)
    mask = _align_mask(mask, diff)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(diff * mask) / denom


def _align_mask(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast an [H, W] mask over trailing channel dims of ``like``.

    Note the masked-mean denominator counts mask *elements after broadcast*
    (so an [H, W] mask over RGB counts 3 per pixel), matching the reference's
    ``masked_select(...).mean()`` on a tiled mask (``src/Utils.cc:39-52``).
    """
    mask = mask.astype(like.dtype)
    while mask.ndim < like.ndim:
        mask = mask[..., None]
    return jnp.broadcast_to(mask, like.shape)


def l1_tracking(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sum absolute error (the tracking loss uses sums so per-pixel gradients
    do not shrink with resolution). Matches ``L1LossForTracking``
    (``src/Utils.cc:47-52``)."""
    diff = jnp.abs(pred - target)
    if mask is not None:
        diff = diff * _align_mask(mask, diff)
    return jnp.sum(diff)


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float):
    # Host-side numpy (NOT jnp): caching a traced array would leak tracers
    # across jit scopes.
    import numpy as np

    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return g / np.sum(g)


def _depthwise_blur(img: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """Separable depthwise Gaussian filter over ``[H, W, C]`` (valid padding).

    Two 1-D ``lax.conv`` passes with ``feature_group_count=C`` — cheap on the
    VPU and fully fusable, vs. a dense 2-D window.
    """
    w = _gaussian_window(size, sigma).astype(img.dtype)
    c = img.shape[-1]
    x = img[None]  # [1, H, W, C]
    dn = jax.lax.conv_dimension_numbers(x.shape, (size, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    kh = jnp.tile(w[:, None, None, None], (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    kw = jnp.tile(w[None, :, None, None], (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x[0]


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """Mean SSIM over an ``[H, W, C]`` image with an 11x11 Gaussian window.

    Matches the reference's in-house SSIM (``src/Utils.cc:81-120``), including
    the masked variant used by the mapping loss. ``mask`` is ``[H, W]`` and is
    applied to the per-pixel SSIM map after cropping to valid convolution
    output (the reference pads; cropping avoids border bias and changes the
    score by <1e-3 on real images).
    """
    if pred.ndim == 2:
        pred = pred[..., None]
        target = target[..., None]
    blur = lambda x: _depthwise_blur(x, window_size, sigma)
    mu_p = blur(pred)
    mu_t = blur(target)
    mu_pp = blur(pred * pred)
    mu_tt = blur(target * target)
    mu_pt = blur(pred * target)
    var_p = mu_pp - mu_p * mu_p
    var_t = mu_tt - mu_t * mu_t
    cov = mu_pt - mu_p * mu_t
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p * mu_p + mu_t * mu_t + c1) * (var_p + var_t + c2)
    )
    if mask is None:
        return jnp.mean(ssim_map)
    half = window_size // 2
    m = mask[half:-half, half:-half].astype(ssim_map.dtype)[..., None]
    m = jnp.broadcast_to(m, ssim_map.shape)
    return jnp.sum(ssim_map * m) / jnp.maximum(jnp.sum(m), 1.0)


def mapping_image_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    lam: float = 0.8,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``lam * L1 + (1 - lam) * (1 - SSIM)`` — the reference's mapping color
    loss (``src/Render.cc:420-483``, ``Mapping.lambda``)."""
    return lam * l1_mapping(pred, target, mask) + (1.0 - lam) * (
        1.0 - ssim(pred, target, mask)
    )


def scale_regularizers(
    log_scales: jnp.ndarray,
    active: jnp.ndarray,
    scene_radius: jnp.ndarray | float,
    overshoot_frac: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Anisotropy + absolute-size regularizers on Gaussian scales.

    Matches the reference mapping regularizers (``src/Render.cc:460-470``):
    ``regLong`` penalizes (max - min) per-splat scale; ``regScalar`` penalizes
    scale beyond ``overshoot_frac * scene_radius``. Inactive (padded) splats
    are masked out.
    """
    scales = jnp.exp(log_scales)  # [N, 3]
    w = active.astype(scales.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    aniso = jnp.sum((jnp.max(scales, -1) - jnp.min(scales, -1)) * w) / denom
    limit = overshoot_frac * scene_radius
    overshoot = jnp.sum(jnp.maximum(scales - limit, 0.0) * w[:, None]) / denom
    return aniso, overshoot
