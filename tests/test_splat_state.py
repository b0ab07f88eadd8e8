import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsorb_slam_tpu.core.config import MappingConfig, TrackingConfig
from gsorb_slam_tpu.splat import gaussians as G


def make_points(rng, n):
    means = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(size=(n, 3)).astype(np.float32)
    z = rng.uniform(0.5, 3.0, size=(n,)).astype(np.float32)
    return jnp.asarray(means), jnp.asarray(rgb), jnp.asarray(z)


def test_add_points_basic(rng):
    gm = G.empty_map(64)
    means, rgb, z = make_points(rng, 10)
    valid = jnp.ones(10, bool)
    gm = G.add_points(gm, means, rgb, z, valid, fx=500.0, fy=500.0)
    assert int(gm.count) == 10
    assert int(gm.n_active()) == 10
    np.testing.assert_allclose(np.asarray(gm.means[:10]), np.asarray(means))
    np.testing.assert_allclose(np.asarray(gm.rgb[:10]), np.asarray(rgb))
    # quat=identity, logit-opacity=1 (src/Gaussian.cc:55-57)
    np.testing.assert_allclose(np.asarray(gm.quats[:10, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(gm.logit_opacities[:10]), 1.0)
    # SinglePixel scale: log(z / ((fx+fy)/2))
    np.testing.assert_allclose(
        np.asarray(gm.log_scales[:10, 0]),
        np.log(np.asarray(z) / 500.0),
        rtol=1e-5,
    )


def test_add_points_partial_validity(rng):
    gm = G.empty_map(64)
    means, rgb, z = make_points(rng, 10)
    valid = jnp.asarray(np.arange(10) % 2 == 0)
    gm = G.add_points(gm, means, rgb, z, valid, 500.0, 500.0)
    assert int(gm.count) == 5
    np.testing.assert_allclose(
        np.asarray(gm.means[:5]), np.asarray(means)[::2], rtol=1e-6
    )


def test_add_points_overflow_drops(rng):
    gm = G.empty_map(8)
    means, rgb, z = make_points(rng, 20)
    gm = G.add_points(gm, means, rgb, z, jnp.ones(20, bool), 500.0, 500.0)
    assert int(gm.count) == 8
    assert int(gm.n_active()) == 8


def test_add_points_appends_after_existing(rng):
    gm = G.empty_map(32)
    m1, c1, z1 = make_points(rng, 4)
    gm = G.add_points(gm, m1, c1, z1, jnp.ones(4, bool), 500.0, 500.0)
    m2, c2, z2 = make_points(rng, 3)
    gm = G.add_points(gm, m2, c2, z2, jnp.ones(3, bool), 500.0, 500.0)
    assert int(gm.count) == 7
    np.testing.assert_allclose(np.asarray(gm.means[4:7]), np.asarray(m2), rtol=1e-6)


def test_prune_and_compact(rng):
    gm = G.empty_map(32)
    means, rgb, z = make_points(rng, 10)
    gm = G.add_points(gm, means, rgb, z, jnp.ones(10, bool), 500.0, 500.0)
    # Force some opacities below the prune threshold.
    gm = dataclasses.replace(
        gm, logit_opacities=gm.logit_opacities.at[jnp.array([2, 5])].set(-20.0)
    )
    gm = G.prune_low_opacity(gm, 0.005)
    assert int(gm.n_active()) == 8
    keep = [i for i in range(10) if i not in (2, 5)]
    gm2 = G.compact(gm)
    assert int(gm2.count) == 8
    np.testing.assert_allclose(
        np.asarray(gm2.means[:8]), np.asarray(means)[keep], rtol=1e-6
    )
    # Freed slots are reusable after compaction.
    m3, c3, z3 = make_points(rng, 2)
    gm3 = G.add_points(gm2, m3, c3, z3, jnp.ones(2, bool), 500.0, 500.0)
    assert int(gm3.count) == 10
    np.testing.assert_allclose(np.asarray(gm3.means[8:10]), np.asarray(m3), rtol=1e-6)


def test_adam_step_matches_torch_semantics(rng):
    """Masked Adam must reproduce torch.optim.Adam (eps inside sqrt-denom
    formulation) for the active rows."""
    torch = pytest.importorskip("torch")
    gm = G.empty_map(16)
    means, rgb, z = make_points(rng, 8)
    gm = G.add_points(gm, means, rgb, z, jnp.ones(8, bool), 500.0, 500.0)
    lrs = G.map_learning_rates(MappingConfig())

    t_means = torch.tensor(np.asarray(gm.means[:8]), requires_grad=True)
    opt = torch.optim.Adam([t_means], lr=lrs["means"], eps=1e-15)

    g_np = rng.normal(size=(8, 3)).astype(np.float32)
    grads = {k: jnp.zeros_like(v) for k, v in gm.params().items()}
    grads["means"] = jnp.zeros_like(gm.means).at[:8].set(jnp.asarray(g_np))

    for _ in range(3):
        gm = G.adam_step(gm, grads, lrs)
        t_means.grad = torch.tensor(g_np)
        opt.step()

    np.testing.assert_allclose(
        np.asarray(gm.means[:8]), t_means.detach().numpy(), rtol=1e-5, atol=1e-7
    )
    # Inactive rows untouched.
    np.testing.assert_allclose(np.asarray(gm.means[8:]), 0.0)


def test_densify_then_adam_moments_are_zero_for_new_rows(rng):
    gm = G.empty_map(16)
    m1, c1, z1 = make_points(rng, 4)
    gm = G.add_points(gm, m1, c1, z1, jnp.ones(4, bool), 500.0, 500.0)
    lrs = G.map_learning_rates(MappingConfig())
    grads = {k: jnp.ones_like(v) for k, v in gm.params().items()}
    gm = G.adam_step(gm, grads, lrs)
    m2, c2, z2 = make_points(rng, 4)
    gm = G.add_points(gm, m2, c2, z2, jnp.ones(4, bool), 500.0, 500.0)
    # New rows' moments zeroed (CatTensorToOptimizer parity).
    np.testing.assert_allclose(np.asarray(gm.adam_m["means"][4:8]), 0.0)
    assert float(jnp.max(jnp.abs(gm.adam_m["means"][:4]))) > 0


def test_pose_adam_step(rng):
    torch = pytest.importorskip("torch")
    cfg = TrackingConfig()
    q0 = np.array([1.0, 0.01, -0.02, 0.03], np.float32)
    t0 = np.array([0.1, 0.2, 0.3], np.float32)
    ps = G.init_pose_state(jnp.asarray(q0), jnp.asarray(t0))

    tq = torch.tensor(q0, requires_grad=True)
    tt = torch.tensor(t0, requires_grad=True)
    opt = torch.optim.Adam(
        [
            {"params": [tq], "lr": cfg.lr_cam_quat},
            {"params": [tt], "lr": cfg.lr_cam_trans},
        ],
        eps=1e-15,
    )
    gq = rng.normal(size=4).astype(np.float32)
    gt = rng.normal(size=3).astype(np.float32)
    for _ in range(5):
        ps = G.pose_adam_step(ps, jnp.asarray(gq), jnp.asarray(gt), cfg)
        tq.grad = torch.tensor(gq)
        tt.grad = torch.tensor(gt)
        opt.step()
    np.testing.assert_allclose(np.asarray(ps.quat), tq.detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ps.trans), tt.detach().numpy(), rtol=1e-5)


def test_add_points_jittable(rng):
    gm = G.empty_map(64)
    means, rgb, z = make_points(rng, 10)
    f = jax.jit(lambda gm, m, c, z, v: G.add_points(gm, m, c, z, v, 500.0, 500.0))
    gm = f(gm, means, rgb, z, jnp.ones(10, bool))
    assert int(gm.count) == 10


def test_add_points_recycles_dead_slots(rng):
    """A capacity-full map must keep accepting splats by recycling pruned
    rows (VERDICT r3 item 4). Holes below the high-water mark fill first,
    in index order; the high-water mark only rises for tail allocations."""
    gm = G.empty_map(32)
    means, rgb, z = make_points(rng, 32)
    gm = G.add_points(gm, means, rgb, z, jnp.ones(32, bool), fx=500.0, fy=500.0)
    assert int(gm.count) == 32 and int(gm.n_active()) == 32

    # Kill rows 3, 7, 20 (mask-only prune).
    dead = jnp.zeros(32, bool).at[jnp.asarray([3, 7, 20])].set(True)
    gm = dataclasses.replace(gm, active=gm.active & ~dead)
    # also poison their Adam moments to check the recycle zeroes them
    gm.adam_m["means"] = gm.adam_m["means"].at[3].set(9.0)

    m2, r2, z2 = make_points(rng, 5)
    gm2 = G.add_points(gm, m2, r2, z2, jnp.ones(5, bool), fx=500.0, fy=500.0)
    # 3 recycled + 2 dropped (no tail space): count unchanged, 32 active.
    assert int(gm2.count) == 32
    assert int(gm2.n_active()) == 32
    np.testing.assert_allclose(np.asarray(gm2.means[3]), np.asarray(m2[0]))
    np.testing.assert_allclose(np.asarray(gm2.means[7]), np.asarray(m2[1]))
    np.testing.assert_allclose(np.asarray(gm2.means[20]), np.asarray(m2[2]))
    np.testing.assert_allclose(np.asarray(gm2.adam_m["means"][3]), 0.0)
    np.testing.assert_allclose(np.asarray(gm2.logit_opacities[3]), 1.0)


def test_add_points_recycles_holes_then_tail(rng):
    gm = G.empty_map(16)
    means, rgb, z = make_points(rng, 8)
    gm = G.add_points(gm, means, rgb, z, jnp.ones(8, bool), fx=500.0, fy=500.0)
    gm = dataclasses.replace(
        gm, active=gm.active.at[2].set(False).at[5].set(False)
    )
    m2, r2, z2 = make_points(rng, 4)
    gm2 = G.add_points(gm, m2, r2, z2, jnp.ones(4, bool), fx=500.0, fy=500.0)
    # holes 2 and 5 first, then tail rows 8, 9.
    np.testing.assert_allclose(np.asarray(gm2.means[2]), np.asarray(m2[0]))
    np.testing.assert_allclose(np.asarray(gm2.means[5]), np.asarray(m2[1]))
    np.testing.assert_allclose(np.asarray(gm2.means[8]), np.asarray(m2[2]))
    np.testing.assert_allclose(np.asarray(gm2.means[9]), np.asarray(m2[3]))
    assert int(gm2.count) == 10  # high-water mark moved only for the tail
    assert int(gm2.n_active()) == 10


def test_prune_to_budget_cuts_weakest(rng):
    gm = G.empty_map(64)
    means, rgb, z = make_points(rng, 60)
    gm = G.add_points(gm, means, rgb, z, jnp.ones(60, bool), fx=500.0, fy=500.0)
    # Give rows 0..9 low opacity, the rest high.
    lo = jnp.asarray(rng.uniform(-5.0, -4.0, 10), jnp.float32)
    hi = jnp.asarray(rng.uniform(2.0, 3.0, 50), jnp.float32)
    gm = dataclasses.replace(
        gm, logit_opacities=gm.logit_opacities.at[:10].set(lo).at[10:60].set(hi)
    )
    gm2 = G.prune_to_budget(gm, target_frac=50 / 64)
    assert int(gm2.n_active()) == 50
    # exactly the low-opacity rows died
    assert not bool(jnp.any(gm2.active[:10]))
    assert bool(jnp.all(gm2.active[10:60]))
    # under budget: no-op
    gm3 = G.prune_to_budget(gm2, target_frac=55 / 64)
    assert int(gm3.n_active()) == 50
