"""Pure-JAX LPIPS (AlexNet backbone) — the in-framework replacement for the
reference's TorchScript LPIPS evaluation (``src/Utils.cc:373,440``,
``scripts/replay.py:20,341``; the TorchScript model itself is produced
offline by ``scripts/gen_eval_model.py`` on the author's machine).

Weights are NOT bundled (pretrained AlexNet + LPIPS linear heads; no
network egress here, exactly as the reference repo does not bundle its
TorchScript models). On a machine with egress run
``scripts/export_lpips_weights.py`` once to produce ``lpips_alex.npz``,
then point ``GSORB_LPIPS_WEIGHTS`` at it (or drop it in ``assets/``).

Architecture (Zhang et al. 2018, lpips==0.1 'alex'):
  features = AlexNet conv stack, tapped after relu1..relu5;
  per layer: channel-unit-normalize both images' features, squared
  difference, 1x1 linear head (non-negative weights), spatial mean;
  LPIPS = sum over the 5 layers.
Input: [H, W, 3] in [0, 1]; scaled to [-1, 1] then shift/scale normalized
with the published constants.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# lpips.networks.ScalingLayer constants (shift/scale of [-1,1] inputs).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet conv stack geometry: (out_ch, kernel, stride, pad), maxpool flags.
_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (True, True, False, False, False)  # 3x3/2 maxpool after relu


def default_weights_path() -> str | None:
    cand = os.environ.get("GSORB_LPIPS_WEIGHTS")
    if cand and os.path.exists(cand):
        return cand
    here = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "lpips_alex.npz",
    )
    return here if os.path.exists(here) else None


def load_lpips_weights(path: str) -> dict:
    """Load the exported npz: conv{i}_w [kh,kw,cin,cout], conv{i}_b [cout],
    lin{i}_w [cout] for i in 0..4."""
    z = np.load(path)
    w = {}
    for i in range(5):
        w[f"conv{i}_w"] = jnp.asarray(z[f"conv{i}_w"], jnp.float32)
        w[f"conv{i}_b"] = jnp.asarray(z[f"conv{i}_b"], jnp.float32)
        w[f"lin{i}_w"] = jnp.asarray(z[f"lin{i}_w"], jnp.float32)
    return w


def _features(img: jnp.ndarray, w: dict) -> list[jnp.ndarray]:
    """img [H, W, 3] in [0,1] -> list of 5 feature maps [h, w, c]."""
    x = img * 2.0 - 1.0
    x = (x - _SHIFT) / _SCALE
    x = x[None]  # NHWC
    feats = []
    for i, (cout, k, stride, pad) in enumerate(_CONVS):
        x = jax.lax.conv_general_dilated(
            x, w[f"conv{i}_w"],
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + w[f"conv{i}_b"]
        x = jax.nn.relu(x)
        feats.append(x[0])
        if _POOL_AFTER[i]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def _unit_norm(f: jnp.ndarray) -> jnp.ndarray:
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-10)


@functools.partial(jax.jit, static_argnums=())
def lpips_pair(pred: jnp.ndarray, target: jnp.ndarray, w: dict) -> jnp.ndarray:
    """LPIPS distance between two [H, W, 3] images in [0, 1]."""
    fa = _features(pred, w)
    fb = _features(target, w)
    total = jnp.zeros(())
    for i, (a, b) in enumerate(zip(fa, fb)):
        d = (_unit_norm(a) - _unit_norm(b)) ** 2  # [h, w, c]
        total = total + jnp.mean(jnp.sum(d * w[f"lin{i}_w"], axis=-1))
    return total
