"""Naive backend: oracle cross-checks for jnp, blockwise, and Pallas paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle import forces_numpy, step_numpy
from wgpu_n_body_tpu.inits import uniform_init
from wgpu_n_body_tpu.models.naive import NaiveSim
from wgpu_n_body_tpu.ops.integrate import leapfrog_step
from wgpu_n_body_tpu.ops.naive_pallas import naive_forces_pallas
from wgpu_n_body_tpu.ops.naive_ref import naive_forces_dense, naive_forces_ref
from wgpu_n_body_tpu.params import NaiveParams, ParticleState, SimParams


def _random_state(key, n, with_acc=True):
    kp, kv, ka, km = jax.random.split(key, 4)
    return ParticleState(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32, -1, 1),
        vel=jax.random.uniform(kv, (n, 3), jnp.float32, -0.1, 0.1),
        acc=(
            jax.random.uniform(ka, (n, 3), jnp.float32, -0.01, 0.01)
            if with_acc
            else jnp.zeros((n, 3), jnp.float32)
        ),
        mass=jax.random.uniform(km, (n,), jnp.float32, 0.5, 2.0),
    )


def test_dense_forces_match_numpy_oracle():
    st = _random_state(jax.random.key(0), 17)
    params = SimParams(particle_num=17, g=1e-3, e=1e-4, dt=0.016)
    pos_new = st.pos + 0.01 * st.vel
    got = naive_forces_dense(pos_new, st.pos, st.mass, params)
    want = forces_numpy(pos_new, st.pos, st.mass, params.g, params.e, params.dt)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-9)


def test_full_step_matches_numpy_oracle():
    st = _random_state(jax.random.key(1), 13)
    params = SimParams(particle_num=13, g=1e-3, e=1e-4, dt=0.016)
    out = leapfrog_step(
        st, params, lambda pn, po, m: naive_forces_dense(pn, po, m, params)
    )
    wp, wv, wa = step_numpy(
        st.pos, st.vel, st.acc, st.mass, params.g, params.e, params.dt
    )
    np.testing.assert_allclose(np.asarray(out.pos), wp, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.vel), wv, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.acc), wa, rtol=2e-4, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(out.mass), np.asarray(st.mass))


def test_blockwise_matches_dense():
    st = _random_state(jax.random.key(2), 300)
    params = SimParams(particle_num=300, g=1e-4)
    pos_new = st.pos + 0.005
    dense = naive_forces_dense(pos_new, st.pos, st.mass, params)
    blocked = naive_forces_ref(pos_new, st.pos, st.mass, params, block=128)
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(dense), rtol=1e-5, atol=1e-9
    )


@pytest.mark.parametrize("n", [64, 200, 1000])
def test_pallas_matches_dense(n):
    st = _random_state(jax.random.key(3), n)
    params = SimParams(particle_num=n, g=1e-4, e=1e-4, dt=0.016)
    pos_new = st.pos + 0.01 * st.vel
    dense = naive_forces_dense(pos_new, st.pos, st.mass, params)
    pallas = naive_forces_pallas(
        pos_new, st.pos, st.mass, params, tile_i=64, tile_j=128
    )
    np.testing.assert_allclose(
        np.asarray(pallas), np.asarray(dense), rtol=3e-5, atol=1e-9
    )


@pytest.mark.parametrize("n", [200, 1000])
def test_pallas_mxu_variant_matches_dense_loosely(n):
    """Opt-in MXU-hybrid kernel (NaiveParams.mxu): the factored
    sum(w*p_j) - p_i*sum(w) accumulation is NOT reference-exact — measured
    f32-vs-f64 error is ~2e-4 p99 / ~3e-2 max-rel on near-zero-acc
    particles (NumPy probe, PERF.md round 4) — so it gets its own looser
    bound here; the exact default path keeps the strict one above."""
    st = _random_state(jax.random.key(3), n)
    params = SimParams(particle_num=n, g=1e-4, e=1e-4, dt=0.016)
    pos_new = st.pos + 0.01 * st.vel
    dense = naive_forces_dense(pos_new, st.pos, st.mass, params)
    pallas = naive_forces_pallas(
        pos_new, st.pos, st.mass, params, tile_i=128, tile_j=128, mxu=True
    )
    np.testing.assert_allclose(
        np.asarray(pallas), np.asarray(dense), rtol=5e-2, atol=2e-8
    )
    # and the shard path keeps the diagonal self-mask aligned
    shard = naive_forces_pallas(
        pos_new[64:192],
        st.pos,
        st.mass,
        params,
        tile_i=128,
        tile_j=128,
        mxu=True,
        row_offset=64,
    )
    np.testing.assert_allclose(
        np.asarray(shard), np.asarray(dense[64:192]), rtol=5e-2, atol=2e-8
    )


def test_naive_sim_backend_runs_and_paths_agree():
    params = SimParams(particle_num=256, g=1e-5)
    st = uniform_init(jax.random.key(4), params)
    jnp_step = NaiveSim(params, NaiveParams(use_pallas=False)).make_step(donate=False)
    pl_step = NaiveSim(
        params, NaiveParams(use_pallas=True, tile_i=64, tile_j=128)
    ).make_step(donate=False)
    a, b = st, st
    for _ in range(3):
        a = jnp_step(a)
        b = pl_step(b)
    np.testing.assert_allclose(
        np.asarray(a.pos), np.asarray(b.pos), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(a.vel), np.asarray(b.vel), rtol=1e-4, atol=1e-8
    )


def test_step_preserves_particle_order_and_mass():
    # NaiveSim keeps particle identity order (reference naive.rs, unlike tree).
    params = SimParams(particle_num=128)
    st = _random_state(jax.random.key(5), 128)
    step = NaiveSim(params, NaiveParams(use_pallas=False)).make_step(donate=False)
    out = step(st)
    np.testing.assert_array_equal(np.asarray(out.mass), np.asarray(st.mass))
    assert out.pos.shape == st.pos.shape


def test_donated_step_runs():
    params = SimParams(particle_num=64)
    st = uniform_init(jax.random.key(6), params)
    step = NaiveSim(params, NaiveParams(use_pallas=False)).make_step(donate=True)
    out = step(st)
    assert np.isfinite(np.asarray(out.pos)).all()
