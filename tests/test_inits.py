"""Distribution-property tests for the scene generators (reference src/inits.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_n_body_tpu.inits import disc_init, spherical_init, uniform_init
from wgpu_n_body_tpu.params import SimParams, validate_state


def test_uniform_shapes_and_ranges():
    params = SimParams(particle_num=5000)
    st = uniform_init(jax.random.key(0), params)
    validate_state(st)
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel)
    assert pos.shape == (5000, 3)
    assert pos.min() >= -1.0 and pos.max() <= 1.0
    # vel = U[-1,1] * 0.001 (inits.rs:17-21)
    assert np.abs(vel).max() <= 0.001
    assert np.abs(vel).max() > 0.0005  # not degenerate
    np.testing.assert_array_equal(np.asarray(st.mass), 1.0)
    np.testing.assert_array_equal(np.asarray(st.acc), 0.0)
    # roughly uniform: mean near 0, spread near 1/sqrt(3)
    assert abs(pos.mean()) < 0.02
    assert abs(pos.std() - (2 / np.sqrt(12))) < 0.02


def test_disc_central_body_and_annulus():
    params = SimParams(particle_num=4096, g=1e-5)
    st = disc_init(jax.random.key(1), params)
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel)
    mass = np.asarray(st.mass)
    # central body (inits.rs:33-38)
    np.testing.assert_array_equal(pos[0], 0.0)
    np.testing.assert_array_equal(vel[0], 0.0)
    assert mass[0] == 150000.0
    np.testing.assert_array_equal(mass[1:], 1.0)
    # others: pre-scale radius in (0.25, 1] means post-scale |p| = r^2 in
    # (0.0625, 1] (inits.rs:41,44)
    r = np.linalg.norm(pos[1:], axis=1)
    assert r.min() >= 0.25**2 - 1e-6
    assert r.max() <= 1.0 + 1e-6
    # circular-orbit speed sqrt(g*1000/|p|) (inits.rs:45)
    speed = np.linalg.norm(vel[1:], axis=1)
    np.testing.assert_allclose(speed, np.sqrt(1e-5 * 1000.0 / r), rtol=1e-4)
    # velocity is tangential: v . p = 0
    dots = np.abs(np.sum(vel[1:] * pos[1:], axis=1))
    assert dots.max() < 1e-5
    # z is small: either 0 (first draw) or |z_pre|<=0.1 scaled by |p_pre|<=1
    assert np.abs(pos[1:, 2]).max() <= 0.1 + 1e-6


def test_spherical_ball_and_masses():
    params = SimParams(particle_num=4096)
    st = spherical_init(jax.random.key(2), params)
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel)
    mass = np.asarray(st.mass)
    r = np.linalg.norm(pos, axis=1)
    assert r.max() <= 1.0 + 1e-6
    # outward radial velocity of 0.4 (inits.rs:57,74)
    np.testing.assert_allclose(np.linalg.norm(vel, axis=1), 0.4, rtol=1e-5)
    cosang = np.sum(vel * pos, axis=1) / (r * 0.4)
    np.testing.assert_allclose(cosang, 1.0, rtol=1e-4)
    assert mass.min() >= 1.0 and mass.max() <= 3.0
    assert abs(mass.mean() - 2.0) < 0.05


def test_inits_are_jittable_and_reproducible():
    params = SimParams(particle_num=512)
    for fn in (uniform_init, disc_init, spherical_init):
        jitted = jax.jit(fn, static_argnums=1)
        a = jitted(jax.random.key(7), params)
        b = fn(jax.random.key(7), params)
        for x, y in zip(a, b):
            # jit vs eager may differ by one ulp through fused rsqrt/norm
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7
            )
