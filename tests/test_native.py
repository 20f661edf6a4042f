"""Native C++ octree builder: invariants, device cross-check, hybrid backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_n_body_tpu.inits import uniform_init
from wgpu_n_body_tpu.params import ParticleState, SimParams, TreeParams

native = pytest.importorskip("wgpu_n_body_tpu.native.build")
if not native.native_available():
    pytest.skip("no C++ toolchain for native octree", allow_module_level=True)


def _pos_mass(n, seed=0):
    kp, km = jax.random.split(jax.random.key(seed))
    pos = np.asarray(jax.random.uniform(kp, (n, 3), jnp.float32, -1, 1))
    mass = np.asarray(jax.random.uniform(km, (n,), jnp.float32, 0.5, 2.0))
    return pos, mass


def test_host_tree_invariants():
    n = 500
    pos, mass = _pos_mass(n)
    t = native.build_host_tree(pos, mass)
    bodies = t.bodies()
    assert bodies[0] == n
    np.testing.assert_allclose(t.mass()[0], mass.sum(), rtol=1e-5)
    assert t.root_width == 2.0  # all |coord| <= 1 -> bound identity 1.0
    # singleton leaves hold exact particle positions
    leaves = bodies == 1
    assert leaves.sum() == n
    leaf_cog = t.cog()[leaves]
    leaf_pids = t.children()[leaves][:, 0]
    np.testing.assert_array_equal(leaf_cog, pos[leaf_pids])
    # order is a permutation
    assert sorted(t.order.tolist()) == list(range(n))
    # DFS arena: skips advance, root covers everything
    m = t.nodes_f32.shape[0] - 1
    assert t.skip[0] == m
    assert (t.skip[:m] > np.arange(m)).all()
    np.testing.assert_allclose(t.nodes_f32[0, 3], mass.sum(), rtol=1e-5)
    # first/count: root spans all; leaf firsts are a permutation of 0..n-1
    assert t.first[0] == 0 and t.count[0] == n
    arena_leaves = t.nodes_f32[:m, 6] > 0
    assert sorted(t.first[:m][arena_leaves].tolist()) == list(range(n))


def test_host_dfs_order_matches_morton_sort():
    # The reference's DFS sort order == Morton order (same child bit layout)
    from wgpu_n_body_tpu.ops.tree_build import morton_sort

    n = 300
    pos, mass = _pos_mass(n, seed=1)
    st = ParticleState(
        pos=jnp.asarray(pos),
        vel=jnp.zeros((n, 3)),
        acc=jnp.zeros((n, 3)),
        mass=jnp.asarray(mass),
    )
    t = native.build_host_tree(pos, mass)
    sorted_st, _, _ = morton_sort(st, depth=20)
    np.testing.assert_allclose(
        np.asarray(sorted_st.pos), pos[t.order], atol=0
    )



@pytest.mark.slow
def test_host_arena_forces_match_device_arena_forces():
    from wgpu_n_body_tpu.ops.naive_ref import naive_forces_dense
    from wgpu_n_body_tpu.ops.tree_build import TreeArrays, build_tree, morton_sort
    from wgpu_n_body_tpu.ops.tree_walk import tree_forces

    n = 400
    params = SimParams(particle_num=n, g=1e-3)
    # the host tree subdivides to singletons: compare with leaf_bucket=1
    tp = TreeParams(theta=0.5, max_depth=16, leaf_bucket=1)
    pos, mass = _pos_mass(n, seed=2)
    st = ParticleState(
        pos=jnp.asarray(pos), vel=jnp.zeros((n, 3)),
        acc=jnp.zeros((n, 3)), mass=jnp.asarray(mass),
    )
    # device path
    ss, bound, keys = morton_sort(st, tp.max_depth)
    dtree = build_tree(ss, keys, bound, tp)
    dev = np.asarray(tree_forces(ss.pos, ss.pos, ss.mass, dtree, params, tp))
    # host path (same sorted order per the test above)
    h = native.build_host_tree(pos, mass)
    m = h.nodes_f32.shape[0] - 1
    htree = TreeArrays(
        nodes_f32=jnp.asarray(h.nodes_f32),
        skip=jnp.asarray(h.skip),
        first=jnp.asarray(h.first),
        count=jnp.asarray(h.count),
        num_nodes=jnp.asarray(m, jnp.int32),
        root_width=jnp.asarray(h.root_width),
        overflowed=jnp.asarray(False),
    )
    sorted_pos = jnp.asarray(pos[h.order])
    sorted_mass = jnp.asarray(mass[h.order])
    hst = np.asarray(
        tree_forces(sorted_pos, sorted_pos, sorted_mass, htree, params, tp)
    )
    np.testing.assert_allclose(hst, dev, rtol=5e-4, atol=1e-8)
    # and both approximate the truth
    exact = np.asarray(naive_forces_dense(ss.pos, ss.pos, ss.mass, params))
    scale = np.linalg.norm(exact, axis=1).mean()
    assert np.abs(dev - exact).mean() / scale < 0.01



@pytest.mark.slow
def test_hybrid_backend_matches_device_backend():
    from wgpu_n_body_tpu.models.tree import TreeSim
    from wgpu_n_body_tpu.models.tree_host import TreeSimHost

    params = SimParams(particle_num=256, g=1e-4)
    tp = TreeParams(theta=0.5, max_depth=16, walk="per_particle", leaf_bucket=1)
    st = uniform_init(jax.random.key(3), params)
    dev_step = TreeSim(params, tp).make_step(donate=False)
    host_step = TreeSimHost(params, tp).make_step(donate=False)
    a, b = st, st
    for _ in range(3):
        a = dev_step(a)
        b = host_step(b)
    np.testing.assert_allclose(
        np.asarray(a.pos), np.asarray(b.pos), rtol=1e-4, atol=1e-6
    )


def test_coincident_cluster_rejected():
    # Coincident particles chain forever in the reference; our builder
    # fails loudly — either arena overflow or the depth guard, depending
    # on which trips first.
    pos = np.zeros((3, 3), np.float32)
    mass = np.ones((3,), np.float32)
    with pytest.raises(RuntimeError, match="coincident|overflow"):
        native.build_host_tree(pos, mass)
