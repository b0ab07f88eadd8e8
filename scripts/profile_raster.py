"""Micro-profile of the raster hot path on the attached accelerator.

Times (ms): current Pallas blend fwd / fwd+bwd, instance preprocess, the
pack gather, lax.sort, segment_sum, and candidate MXU primitives — the
numbers that drive the round-2 kernel redesign.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.raster import RasterConfig, bin_gaussians, preprocess
from gsorb_slam_tpu.raster.instances import pack_raw_instances, preprocess_instances
from gsorb_slam_tpu.raster.pallas_raster import _pack_instances, blend_and_untile
from gsorb_slam_tpu.splat.gaussians import add_points, empty_map


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:55s} {best*1e3:9.3f} ms")
    return best


def main():
    W, H, N, CAP = 640, 480, 250_000, 1 << 18
    cam = Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=W, height=H)
    rcfg = RasterConfig(tile=16, tile_capacity=1024, max_dup=16, chunk=128,
                        dilate_px=8.0, exact_stop=False)
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(0.8, 4.0, N)], -1).astype(np.float32)
    gm = empty_map(CAP)
    gm = add_points(gm, jnp.asarray(means),
                    jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
                    jnp.asarray(means[:, 2]), jnp.ones(N, bool), cam.fx, cam.fy)
    T_cw = jnp.eye(4)
    prep = jax.jit(lambda: preprocess(gm.means, gm.rgb, gm.quats,
                                      gm.logit_opacities, gm.log_scales,
                                      gm.active, T_cw, cam))()
    bins = jax.jit(lambda: bin_gaussians(prep, cam, rcfg))()
    jax.block_until_ready(bins.indices)
    M = int(jnp.sum(bins.counts))
    print(f"instances in bins: {M}  tiles: {bins.indices.shape[0]} cap: {bins.indices.shape[1]}")

    timeit("preprocess (per-gaussian)", jax.jit(
        lambda t: preprocess(gm.means, gm.rgb, gm.quats, gm.logit_opacities,
                             gm.log_scales, gm.active, t, cam)), T_cw)
    timeit("bin_gaussians", jax.jit(lambda p: bin_gaussians(p, cam, rcfg)), prep)

    packed = jax.jit(lambda p: _pack_instances(p, bins))(prep)
    timeit("pack gather [T,12,cap] (per-iter mapping cost)",
           jax.jit(lambda p: _pack_instances(p, bins)), prep)

    raw = jax.jit(lambda: pack_raw_instances(
        gm.means, gm.rgb, gm.quats, gm.logit_opacities, gm.log_scales,
        gm.active, bins))()
    timeit("preprocess_instances (per-iter tracking cost)",
           jax.jit(lambda r, t: preprocess_instances(r, t, cam)), raw, T_cw)

    # current pallas blend
    fwd = jax.jit(lambda p: blend_and_untile(p, bins.counts, cam, rcfg).color)
    timeit("pallas blend fwd", fwd, packed)

    def fwd_loss(p):
        o = blend_and_untile(p, bins.counts, cam, rcfg)
        return jnp.sum(jnp.abs(o.color)) + jnp.sum(o.depth) + jnp.sum(o.alpha)
    timeit("pallas blend fwd+bwd", jax.jit(jax.grad(fwd_loss)), packed)

    # full tracking iteration (preprocess_instances + blend + grads to pose)
    def track_iter(raw, T):
        scr = preprocess_instances(raw, T, cam)
        o = blend_and_untile(scr, bins.counts, cam, rcfg)
        return jnp.sum(jnp.abs(o.color)) + jnp.sum(jnp.abs(o.depth))
    timeit("tracking iter fwd+bwd (d/dT)",
           jax.jit(jax.grad(track_iter, argnums=1)), raw, T_cw)

    # --- primitive candidates ---
    Mpad = 1 << 21
    keys = jnp.asarray(rng.integers(0, CAP, Mpad, dtype=np.int32))
    vals = jnp.asarray(rng.normal(size=(Mpad, 16)).astype(np.float32))
    timeit("lax.sort 2M keys (no payload)", jax.jit(lambda k: jax.lax.sort(k)), keys)
    timeit("lax.sort 2M keys + 16f32 payload",
           jax.jit(lambda k, v: jax.lax.sort(
               [k] + [v[:, i] for i in range(16)], num_keys=1)), keys, vals)
    timeit("argsort 2M + row-gather [2M,16]",
           jax.jit(lambda k, v: v[jnp.argsort(k)]), keys, vals)
    skeys = jnp.sort(keys)
    timeit("segment_sum sorted 2M -> 256k x16",
           jax.jit(lambda k, v: jax.ops.segment_sum(
               v, k, num_segments=CAP, indices_are_sorted=True)), skeys, vals)
    timeit("segment_sum UNsorted 2M -> 256k x16",
           jax.jit(lambda k, v: jax.ops.segment_sum(
               v, k, num_segments=CAP, indices_are_sorted=False)), keys, vals)
    idx = jnp.asarray(rng.integers(0, CAP, Mpad, dtype=np.int32))
    tbl = jnp.asarray(rng.normal(size=(CAP, 16)).astype(np.float32))
    timeit("row gather [256k,16] by 2M idx", jax.jit(lambda t, i: t[i]), tbl, idx)
    tbl64 = jnp.asarray(rng.normal(size=(CAP, 64)).astype(np.float32))
    timeit("row gather [256k,64] by 2M idx", jax.jit(lambda t, i: t[i]), tbl64, idx)

    # one-hot matmul gather within tile (cap -> cap), f32 and bf16
    Tt = bins.indices.shape[0]
    src = jnp.asarray(rng.normal(size=(Tt, 1024, 16)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(np.tile(np.arange(1024), (Tt, 1))).astype(np.int32)) \
        if False else jnp.argsort(jnp.asarray(rng.normal(size=(Tt, 1024))), axis=-1).astype(jnp.int32)

    def onehot_gather(src, perm, dt):
        oh = (perm[:, :, None] == jnp.arange(1024)[None, None, :]).astype(dt)
        return jnp.einsum("tdc,tca->tda", oh, src.astype(dt),
                          preferred_element_type=jnp.float32)
    timeit("one-hot matmul permute 1200x[1024x1024]@[1024,16] f32",
           jax.jit(lambda s, p: onehot_gather(s, p, jnp.float32)), src, perm)
    timeit("one-hot matmul permute bf16",
           jax.jit(lambda s, p: onehot_gather(s, p, jnp.bfloat16)), src, perm)

    # MXU throughput sanity
    a = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32))
    timeit("matmul 8192^3 f32 (1.1 TFLOP)", jax.jit(lambda a: a @ a), a)
    ab = a.astype(jnp.bfloat16)
    timeit("matmul 8192^3 bf16", jax.jit(
        lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32)), ab)


if __name__ == "__main__":
    main()
