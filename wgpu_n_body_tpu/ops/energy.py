"""Energy diagnostics (new subsystem — the reference has none, SURVEY.md §5).

Kinetic energy is exact: KE = 1/2 sum m |v|^2.

Potential energy — two variants:

- ``softened=True`` (default): the potential MATCHED to the reference
  force law. The per-pair force magnitude is g*m/(r^3 + e)
  (naive.wgsl:38-39 — the unit vector times g*m/(r^3+e); NOT Newtonian
  1/r^2 at any radius), and its radial antiderivative has a closed form
  via partial fractions of 1/(s^3 + a^3) with a = e^(1/3):

      I(r) = INT_r^inf ds/(s^3+e)
           = ln((r^2 - a r + a^2) / (r + a)^2) / (6 a^2)
             + (pi/2 - arctan((2r - a)/(a sqrt(3)))) / (a^2 sqrt(3))

  so U_ij = -g m_i m_j I(r_ij) satisfies -dU/dr == the pair force
  exactly, making total_energy a conserved quantity of the *continuous*
  dynamics: residual drift is an integrator property, not a diagnostic
  artifact (VERDICT r4 weak #4 — the Newtonian proxy contributed most
  of the recorded |dE/E|, see PERF.md "Long-horizon").

- ``softened=False``: the Newtonian pair proxy -g m_i m_j / r used
  through round 4, kept for continuity of the recorded characterization.

Evaluated blockwise (O(block*N) memory), jittable at any N.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.params import ParticleState, SimParams


def kinetic_energy(state: ParticleState) -> jnp.ndarray:
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.vel**2, axis=1))


def softened_pair_integral(r: jnp.ndarray, e: float) -> jnp.ndarray:
    """I(r) = INT_r^inf ds/(s^3 + e), elementwise (the matched pair
    potential is U = -g m_i m_j I(r)).

    Well-conditioned everywhere: pi/2 - arctan(x) is computed as
    arctan(1/x) for x > 0 (exact identity; the direct difference loses
    ~3 significant digits in f32 once r >> a). I(0) = 2 pi / (3 sqrt(3)
    a^2) — finite: coincident pairs produce a finite potential even
    though the force direction is NaN there (upstream parity quirk).
    """
    a = e ** (1.0 / 3.0)
    s3 = math.sqrt(3.0)
    x = (2.0 * r - a) / (a * s3)
    cot = jnp.arctan(1.0 / jnp.where(x > 0, x, 1.0))
    at = jnp.where(x > 0, cot, jnp.float32(math.pi / 2) - jnp.arctan(x))
    log_term = jnp.log((r * r - a * r + a * a) / ((r + a) * (r + a)))
    return log_term / (6.0 * a * a) + at / (a * a * s3)


def potential_energy(
    state: ParticleState,
    params: SimParams,
    block: int = 1024,
    softened: bool = True,
) -> jnp.ndarray:
    """sum_{i<j} U_ij blockwise over receiver rows.

    softened=True: U_ij = -g m_i m_j I(r) matched to the force law;
    softened=False: the Newtonian proxy -g m_i m_j / r (r3-era numbers).
    """
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
        if softened:
            pair = softened_pair_integral(r, params.e)
        else:
            pair = 1.0 / r
        return -params.g * jnp.sum(
            jnp.where(valid, mb[:, None] * mass[None, :] * pair, 0.0)
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
    state: ParticleState,
    params: SimParams,
    block: int = 1024,
    softened: bool = True,
) -> jnp.ndarray:
    return kinetic_energy(state) + potential_energy(
        state, params, block, softened=softened
    )
