"""Energy diagnostics (new subsystem — the reference has none, SURVEY.md §5).

Kinetic energy is exact: KE = 1/2 sum m |v|^2.

Potential energy: the reference force law m_j*g/(r^3+e)*r_hat
(naive.wgsl:39) has no closed-form potential because the softening is
applied to r^3. For drift diagnostics we report the Newtonian pair
potential PE = -g * sum_{i<j} m_i m_j / r, which the reference force law
approaches everywhere except r ~ e^(1/3); the diagnostic is a *relative*
drift measure, so the small constant offset is irrelevant.

Evaluated blockwise (O(block*N) memory), jittable at any N.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.params import ParticleState, SimParams


def kinetic_energy(state: ParticleState) -> jnp.ndarray:
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.vel**2, axis=1))


def potential_energy(
    state: ParticleState, params: SimParams, block: int = 1024
) -> jnp.ndarray:
    """-g * sum_{i<j} m_i m_j / r_ij, blockwise over receiver rows."""
    n = state.n
    pos, mass = state.pos, state.mass
    pad = (-n) % block
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    idx_p = jnp.arange(n + pad)
    mass_p = jnp.pad(mass, (0, pad))
    nb = (n + pad) // block

    def one_block(args):
        pb, ib, mb = args
        d = pos[None, :, :] - pb[:, None, :]
        r2 = jnp.sum(d * d, axis=-1)
        valid = (ib[:, None] < jnp.arange(n)[None, :]) & (ib[:, None] < n)
        r = jnp.sqrt(jnp.where(valid, r2, 1.0))
        return -params.g * jnp.sum(
            jnp.where(valid, mb[:, None] * mass[None, :] / r, 0.0)
        )

    parts = lax.map(
        one_block,
        (
            pos_p.reshape(nb, block, 3),
            idx_p.reshape(nb, block),
            mass_p.reshape(nb, block),
        ),
    )
    return jnp.sum(parts)


def total_energy(
    state: ParticleState, params: SimParams, block: int = 1024
) -> jnp.ndarray:
    return kinetic_energy(state) + potential_energy(state, params, block)
