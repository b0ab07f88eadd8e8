"""GSORB-SLAM-TPU: a TPU-native (JAX/XLA/Pallas) Gaussian-Splatting SLAM framework.

A from-scratch rebuild of the capabilities of GSORB-SLAM (IEEE RA-L 2025,
"Gaussian Splatting SLAM benefits from ORB features and Transmittance
information") designed TPU-first:

- the differentiable tile rasterizer is a depth-sort + tile-binning + MXU
  blend pipeline (``raster/``) instead of CUDA kernels,
- the Gaussian map is a fixed-capacity padded pytree with masked
  densify/prune (``splat/``) instead of torch optimizer-state surgery,
- tracking/mapping are jitted functional programs (``slam/``) instead of
  mutexed CPU threads,
- the ORB front-end is vectorized JAX (``frontend/``),
- multi-chip scaling goes through ``jax.sharding`` meshes (``parallel/``).
"""

__version__ = "0.1.0"
