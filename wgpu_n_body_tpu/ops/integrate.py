"""Leapfrog (KDK) integration with the reference's exact semantics.

Reference kernel structure (identical in naive.wgsl:63-68 and
tree.wgsl:105-110):

    vel += acc_prev * dt / 2      # acc_prev already carries a factor dt
    pos += vel * dt               # drift
    acc  = getAcc(pos_new)        # force, *dt applied inside accumulation
    vel += acc * dt / 2

Two deliberate quirks are replicated, not "fixed":

1. dt-inside-acc: the stored ``acc`` field equals sum(a)*dt
   (naive.wgsl:41, tree.wgsl:67), so each half-kick effectively applies
   dt^2/2.
2. new-vs-old positions: each particle drifts first, then evaluates the
   force between its *post-drift* position and every other particle's
   *pre-step* position, because the WGSL kernel reads others from the
   src (old) buffer while aPos was already updated in registers
   (naive.wgsl:58-65: getAcc(aPos_new) loops over particlesSrc).

The force callback therefore takes (pos_new, pos_old, mass) and must
return sum_j m_j*g/(r^3+e)*normalize(p_old_j - p_new_i) * dt.
"""

from __future__ import annotations

from typing import Callable

import jax

from wgpu_n_body_tpu.params import ParticleState, SimParams

ForceFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def leapfrog_step(
    state: ParticleState, params: SimParams, force_fn: ForceFn
) -> ParticleState:
    """One reference-exact KDK step. Pure; safe to jit with donation."""
    half = params.dt / 2.0
    vel_h = state.vel + state.acc * half
    pos_new = state.pos + vel_h * params.dt
    acc_new = force_fn(pos_new, state.pos, state.mass)
    vel_new = vel_h + acc_new * half
    return ParticleState(pos=pos_new, vel=vel_new, acc=acc_new, mass=state.mass)
