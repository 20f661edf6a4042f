"""Group (tile-shared) theta-walk: correctness vs oracle and per-particle walk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_n_body_tpu.inits import uniform_init
from wgpu_n_body_tpu.models.tree import TreeSim
from wgpu_n_body_tpu.ops.naive_ref import naive_forces_dense
from wgpu_n_body_tpu.ops.tree_build import build_tree, morton_sort
from wgpu_n_body_tpu.ops.tree_walk import tree_forces
from wgpu_n_body_tpu.ops.tree_walk_group import group_tree_forces
from wgpu_n_body_tpu.params import ParticleState, SimParams, TreeParams


def _state(key, n):
    kp, km = jax.random.split(key)
    return ParticleState(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32, -1, 1),
        vel=jnp.zeros((n, 3), jnp.float32),
        acc=jnp.zeros((n, 3), jnp.float32),
        mass=jax.random.uniform(km, (n,), jnp.float32, 0.5, 2.0),
    )


def _forces(st, theta, n, tile=32, l_cap=2048, bucket=16, engine="skip",
            **extra):
    params = SimParams(particle_num=n, g=1e-3)
    tp = TreeParams(
        theta=theta, max_depth=10, walk_tile=tile, walk_list_cap=l_cap,
        leaf_bucket=bucket, walk_engine=engine, **extra,
    )
    ss, bound, keys = morton_sort(st, tp.max_depth)
    tree = build_tree(ss, keys, bound, tp)
    grp, stats = group_tree_forces(
        ss.pos, ss.pos, ss.mass, tree, keys, params, tp
    )
    per = tree_forces(ss.pos, ss.pos, ss.mass, tree, params, tp)
    exact = naive_forces_dense(ss.pos, ss.pos, ss.mass, params)
    return np.asarray(grp), np.asarray(per), np.asarray(exact), int(stats.deferred)



@pytest.mark.slow
def test_group_theta_zero_equals_naive():
    n = 200  # not a multiple of the tile -> exercises padding
    for bucket in (1, 16):
        grp, per, exact, _ = _forces(
            _state(jax.random.key(0), n), 0.0, n, bucket=bucket
        )
        np.testing.assert_allclose(grp, exact, rtol=2e-4, atol=1e-8)
        np.testing.assert_allclose(per, exact, rtol=2e-4, atol=1e-8)



@pytest.mark.slow
def test_octet_engine_matches_skip_engine():
    """The octet phase-A engine opens the same conservative node set as
    the skip engine, so both are exact at theta=0 and track the oracle at
    theta=0.75; bucket=1 exercises singleton leaves, bucket=4 member runs."""
    n = 300
    st = _state(jax.random.key(7), n)
    for bucket in (1, 4, 16):
        grp0, _, exact, d0 = _forces(st, 0.0, n, bucket=bucket, engine="octet")
        np.testing.assert_allclose(grp0, exact, rtol=2e-4, atol=1e-8)
        assert d0 == 0
    grp, _, exact, d = _forces(st, 0.75, n, engine="octet")
    scale = np.linalg.norm(exact, axis=1).mean()
    assert d == 0
    assert np.abs(grp - exact).mean() / scale < 0.03



@pytest.mark.slow
def test_group_at_least_as_accurate_as_per_particle():
    n = 384
    grp, per, exact, deferred = _forces(_state(jax.random.key(1), n), 0.75, n)
    assert deferred == 0
    scale = np.linalg.norm(exact, axis=1).mean()
    err_grp = np.abs(grp - exact).mean() / scale
    err_per = np.abs(per - exact).mean() / scale
    assert err_grp <= err_per * 1.01  # conservative opening can't be worse
    assert err_grp < 0.03



@pytest.mark.slow
def test_group_list_overflow_defers_but_stays_exact():
    # theta=0 with a tiny list cap: every tile overflows, all particles go
    # down the per-particle fallback, and the result is still the exact
    # all-pairs answer — overflow degrades speed, never physics.
    n = 256
    grp, _, exact, deferred = _forces(
        _state(jax.random.key(2), n), 0.0, n, tile=32, l_cap=128, bucket=1
    )
    assert deferred == n
    np.testing.assert_allclose(grp, exact, rtol=2e-4, atol=1e-8)


def test_chunked_fallback_exact_beyond_small_tier():
    # Deferral counts above the small tier run the chunked while-loop
    # fallback (batches of b_large); shrink the tier so a 256-particle
    # full-deferral scene takes that path and must still be exact.
    import wgpu_n_body_tpu.ops.tree_walk_group as twg

    old = twg._FB_SMALL_CAP
    twg._FB_SMALL_CAP = 32  # b_small=32, b_large=64 -> 4 chunks
    try:
        n = 256
        grp, _, exact, deferred = _forces(
            _state(jax.random.key(3), n), 0.0, n, tile=32, l_cap=128,
            bucket=1,
        )
    finally:
        twg._FB_SMALL_CAP = old
    assert deferred == n
    np.testing.assert_allclose(grp, exact, rtol=2e-4, atol=1e-8)



@pytest.mark.slow
def test_tree_sim_group_walk_end_to_end():
    params = SimParams(particle_num=300, g=1e-5)
    sim = TreeSim(
        params,
        TreeParams(theta=0.5, max_depth=10, walk="group", walk_tile=64,
                   walk_list_cap=2048),
    )
    st = sim.init_state(jax.random.key(3), uniform_init)
    step = sim.make_step(donate=False)
    out = step(step(st))
    assert np.isfinite(np.asarray(out.pos)).all()
    np.testing.assert_allclose(
        np.sort(np.asarray(out.mass)), np.sort(np.asarray(st.mass))
    )


def test_group_and_per_particle_walks_agree_at_small_theta():
    n = 256
    grp, per, _, _ = _forces(_state(jax.random.key(4), n), 0.1, n)
    np.testing.assert_allclose(grp, per, rtol=1e-3, atol=1e-7)



@pytest.mark.slow
def test_two_pass_straggler_scheduler_exact():
    """The TPU-only two-pass scheduler (pass-1 early stop at the active
    floor + compacted straggler re-walk with a 2x row budget) must
    reproduce the exact theta=0 sum. Forced on via the testing hook
    since the CPU backend normally runs one pass."""
    from wgpu_n_body_tpu.ops import tree_walk_group as twg

    n = 257  # odd N exercises pair-row boundary variants in both passes
    st = _state(jax.random.key(11), n)
    twg._FORCE_TWO_PASS = True
    try:
        for slots2 in (4, 8):  # 8 = wide straggler emission
            grp, _, exact, d = _forces(
                st, 0.0, n, tile=16, bucket=64, engine="octet",
                walk_straggler_slots=slots2,
            )
            assert d == 0
            np.testing.assert_allclose(grp, exact, rtol=2e-4, atol=1e-8)
    finally:
        twg._FORCE_TWO_PASS = False
