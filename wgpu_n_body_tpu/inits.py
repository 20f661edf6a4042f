"""Initial-condition generators (reference: src/inits.rs).

Each generator has signature ``(key, SimParams) -> ParticleState`` — the
JAX-native analog of the reference's ``fn(&SimParams) -> Vec<Particle>``
(src/sims/mod.rs:79): instead of a thread-local RNG, randomness is an
explicit ``jax.random`` key, so scenes are reproducible and jittable.

Distributions match the reference exactly:
- uniform_init   src/inits.rs:6-27   pos U[-1,1]^3, vel U[-1,1]*0.001, mass 1
- disc_init      src/inits.rs:29-54  central body mass 150000 at rest;
                 N-1 bodies rejection-sampled into the annulus
                 0.25 < |p| < 1 (first draw in the z=0 plane, resamples use
                 z*0.1), then pos *= |pos| (density shaping) and circular
                 velocity sqrt(g*1000/|pos'|) * normalize(p x z-hat)
- spherical_init src/inits.rs:56-83  rejection-sampled unit ball, outward
                 radial velocity 0.4, mass U[1,3]

Rejection sampling is vectorized: all pending particles redraw together in
a ``lax.while_loop`` until every one is accepted (expected <40 rounds for
any N; acceptance rates ~0.74 disc / ~0.52 ball per round).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.params import ParticleState, SimParams


def _u(key, shape):
    """U[-1, 1] like the reference's Uniform::new_inclusive(-1.0, 1.0)."""
    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)


def uniform_init(key: jax.Array, sim_params: SimParams) -> ParticleState:
    """Uniform cube scene (reference src/inits.rs:6-27)."""
    n = sim_params.particle_num
    kp, kv = jax.random.split(key)
    return ParticleState(
        pos=_u(kp, (n, 3)),
        vel=_u(kv, (n, 3)) * 0.001,
        acc=jnp.zeros((n, 3), jnp.float32),
        mass=jnp.ones((n,), jnp.float32),
    )


def disc_init(key: jax.Array, sim_params: SimParams) -> ParticleState:
    """Galaxy-disc scene (reference src/inits.rs:29-54).

    Body 0 is the central mass (150000, at rest; inits.rs:33-38). The rest
    are rejection-sampled into the annulus 0.25 < |p| < 1: the first draw is
    in the z=0 plane and every *re*draw uses z = U[-1,1]*0.1 (inits.rs:40-43).
    Accepted positions are scaled by their own length (inits.rs:44) and get
    circular-orbit velocity sqrt(g*1000/|p'|) * normalize(p' x z-hat)
    (inits.rs:45).
    """
    n = sim_params.particle_num
    g = sim_params.g
    k0, key = jax.random.split(key)

    # First draw: (x, y, 0) — z is exactly zero on round 0 (inits.rs:40).
    xy = _u(k0, (n, 2))
    pos = jnp.concatenate([xy, jnp.zeros((n, 1), jnp.float32)], axis=1)

    def ok(p):
        r = jnp.linalg.norm(p, axis=1)
        return (r <= 1.0) & (r >= 0.25)

    def cond(carry):
        _, _, accepted = carry
        return ~jnp.all(accepted)

    def body(carry):
        key, pos, accepted = carry
        key, k = jax.random.split(key)
        cand = _u(k, (n, 3))
        cand = cand.at[:, 2].multiply(0.1)  # resamples use z*0.1 (inits.rs:42)
        pos = jnp.where(accepted[:, None], pos, cand)
        return key, pos, accepted | ok(pos)

    _, pos, _ = lax.while_loop(cond, body, (key, pos, ok(pos)))

    # pos *= |pos| (inits.rs:44), then vel uses the *scaled* length
    # (inits.rs:45 calls pos.length() after the scale).
    r0 = jnp.linalg.norm(pos, axis=1, keepdims=True)
    pos = pos * r0
    r1 = jnp.linalg.norm(pos, axis=1)
    # p x z-hat = (py, -px, 0)
    tangent = jnp.stack(
        [pos[:, 1], -pos[:, 0], jnp.zeros_like(r1)], axis=1
    )
    tangent = tangent / jnp.linalg.norm(tangent, axis=1, keepdims=True)
    vel = jnp.sqrt(g * 1000.0 / r1)[:, None] * tangent

    # Body 0: central mass, at rest at the origin (inits.rs:33-38).
    pos = pos.at[0].set(0.0)
    vel = vel.at[0].set(0.0)
    mass = jnp.ones((n,), jnp.float32).at[0].set(150000.0)
    return ParticleState(
        pos=pos, vel=vel, acc=jnp.zeros((n, 3), jnp.float32), mass=mass
    )


def spherical_init(key: jax.Array, sim_params: SimParams) -> ParticleState:
    """Exploding-sphere scene (reference src/inits.rs:56-83)."""
    n = sim_params.particle_num
    outward_vel = 0.4  # inits.rs:57
    key, km = jax.random.split(key)

    def cond(carry):
        _, _, accepted = carry
        return ~jnp.all(accepted)

    def body(carry):
        key, pos, accepted = carry
        key, k = jax.random.split(key)
        cand = _u(k, (n, 3))
        pos = jnp.where(accepted[:, None], pos, cand)
        return key, pos, accepted | (jnp.linalg.norm(pos, axis=1) <= 1.0)

    key, k = jax.random.split(key)
    pos0 = _u(k, (n, 3))
    accepted0 = jnp.linalg.norm(pos0, axis=1) <= 1.0
    _, pos, _ = lax.while_loop(cond, body, (key, pos0, accepted0))

    r = jnp.linalg.norm(pos, axis=1, keepdims=True)
    vel = pos / r * outward_vel
    mass = _u(km, (n,)) + 2.0  # U[1,3] (inits.rs:79)
    return ParticleState(
        pos=pos, vel=vel, acc=jnp.zeros((n, 3), jnp.float32), mass=mass
    )


INITS = {
    "uniform": uniform_init,
    "disc": disc_init,
    "spherical": spherical_init,
}
