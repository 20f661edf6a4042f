"""Locally-essential-tree schedule: exactness, theta-level agreement with
the replicated schedule, pruned-subtree invariants, overflow, memory
budget. Runs on the 8-virtual-CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_n_body_tpu.inits import disc_init, uniform_init
from wgpu_n_body_tpu.models.naive import NaiveSim
from wgpu_n_body_tpu.models.tree import TreeSim
from wgpu_n_body_tpu.params import NaiveParams, SimParams, TreeParams
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
