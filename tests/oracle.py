"""Scalar NumPy oracle: a literal transcription of the WGSL step semantics.

Mirrors naive.wgsl:50-69 loop-for-loop (old-j vs new-i positions, dt inside
the accumulation, i==index skip). Used to validate every vectorized/Pallas
implementation against an independent formulation.
"""

import numpy as np


def step_numpy(pos, vel, acc, mass, g, e, dt):
    """One KDK step for all particles; float64 internally for a tight oracle."""
    pos = np.asarray(pos, np.float64)
    vel = np.asarray(vel, np.float64)
    acc = np.asarray(acc, np.float64)
    mass = np.asarray(mass, np.float64)
    n = pos.shape[0]
    out_p = np.zeros_like(pos)
    out_v = np.zeros_like(vel)
    out_a = np.zeros_like(acc)
    for i in range(n):
        v = vel[i] + acc[i] * dt / 2.0
        p = pos[i] + v * dt
        a = np.zeros(3)
        for j in range(n):
            if j == i:
                continue
            d = pos[j] - p  # src (old) j position vs post-drift i position
            r = np.linalg.norm(d)
            a += mass[j] * g / (r**3 + e) * (d / r) * dt
        v = v + a * dt / 2.0
        out_p[i], out_v[i], out_a[i] = p, v, a
    return out_p, out_v, out_a


def forces_numpy(pos_new, pos_old, mass, g, e, dt):
    """sum_j m_j*g/(r^3+e)*normalize(p_old_j - p_new_i)*dt, skipping i==j."""
    pos_new = np.asarray(pos_new, np.float64)
    pos_old = np.asarray(pos_old, np.float64)
    mass = np.asarray(mass, np.float64)
    n = pos_new.shape[0]
    out = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            if j == i:
                continue
            d = pos_old[j] - pos_new[i]
            r = np.linalg.norm(d)
            out[i] += mass[j] * g / (r**3 + e) * (d / r) * dt
    return out
