"""Focused gather/scatter alignment experiments for the mapping hot path."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 10


def timeit_loop(name, step_fn, x0, reps=3, r=R):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), x)

    jax.block_until_ready(run(x0, r))
    jax.block_until_ready(run(x0, 0))
    best_full, best_zero = float("inf"), float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, r))
        best_full = min(best_full, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, 0))
        best_zero = min(best_zero, time.perf_counter() - t0)
    per = (best_full - best_zero) / r
    print(f"{name:58s} {per*1e3:9.3f} ms/iter")
    return per


def feed(carry, out):
    leaves = jax.tree_util.tree_leaves(out)
    eps = sum(jnp.sum(l[:1, :1].astype(jnp.float32)) * 1e-38 for l in leaves)
    return jax.tree.map(
        lambda a: a + eps.astype(a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        carry,
    )


def main():
    rng = np.random.default_rng(0)
    C = 1 << 18
    for M in (1 << 20, 600_000 // 128 * 128):
        idx = jnp.asarray(rng.integers(0, C, M, dtype=np.int32))
        print(f"-- M = {M}")
        for A in (8, 12, 16):
            tbl = jnp.asarray(rng.normal(size=(C, A)).astype(np.float32))

            def st_g(c, idx=idx):
                return feed(c, c[idx])

            timeit_loop(f"gather [{C>>10}k,{A}] by {M>>10}k idx", st_g, tbl)

            grads = jnp.asarray(rng.normal(size=(M, A)).astype(np.float32))

            def st_s(c, idx=idx, C=C):
                out = jnp.zeros((C, c.shape[1]), jnp.float32).at[idx].add(c)
                return feed(c, out)

            timeit_loop(f"scatter-add [{M>>10}k,{A}] -> [{C>>10}k,{A}]", st_s, grads)

    # gather into tile-major [T, A, cap] (the actual pack shape) vs flat rows
    T, cap, A = 1200, 1024, 16
    idx2 = jnp.asarray(rng.integers(0, C, (T, cap), dtype=np.int32))
    tbl = jnp.asarray(rng.normal(size=(C, A)).astype(np.float32))

    def st_pack(c):
        rows = c[idx2.reshape(-1)].reshape(T, cap, A)
        return feed(c, jnp.swapaxes(rows, 1, 2))

    timeit_loop("pack gather+transpose [T,16,cap] (1.23M)", st_pack, tbl)

    def st_pack_nt(c):
        rows = c[idx2.reshape(-1)].reshape(T, cap, A)
        return feed(c, rows)

    timeit_loop("pack gather only [T,cap,16] (1.23M)", st_pack_nt, tbl)

    # transpose cost alone [T,16,cap] <-> [T,cap,16]
    x = jnp.asarray(rng.normal(size=(T, cap, A)).astype(np.float32))

    def st_tr(c):
        return feed(c, jnp.swapaxes(c, 1, 2) + 0.0)

    timeit_loop("transpose [T,cap,16]->[T,16,cap]", st_tr, x)

    # bf16 variants
    tbl16 = tbl.astype(jnp.bfloat16)

    def st_g16(c):
        return feed(c, c[idx2.reshape(-1)])

    timeit_loop("gather bf16 [256k,16] by 1.23M", st_g16, tbl16)


if __name__ == "__main__":
    main()
