"""Pure-jnp O(N^2) softened-gravity force — the numerical oracle.

Replicates naive.wgsl:23-48 exactly:

    for each pair (i, j), j != i:
        r   = |p_old_j - p_new_i|
        acc_i += m_j * g / (r^3 + e) * normalize(p_old_j - p_new_i) * dt

Notes on edge cases, matched to the reference:
- Only the self pair i == j is skipped (naive.wgsl:30-32). Two *distinct*
  coincident particles hit normalize(0) -> NaN in WGSL; we propagate the
  same NaN (no epsilon rescue off the diagonal).
- The dt multiply is inside the accumulation (naive.wgsl:41).

``naive_forces_dense`` materializes (N, N) intermediates — fine up to a few
tens of thousands of bodies and the clearest statement of the math.
``naive_forces_ref`` evaluates in row blocks via ``lax.map`` so memory stays
O(block * N); it is jittable at any N and is the CPU-runnable baseline
(BASELINE.json config 1).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.params import SimParams


def _pair_acc(pos_i_new, idx_i, pos_old, mass, params: SimParams):
    """Accum acc for a block of receivers vs all (old) sources.

    pos_i_new: (B, 3) post-drift receiver positions
    idx_i:     (B,)   global receiver indices (for the self mask)
    pos_old:   (N, 3) pre-step source positions
    mass:      (N,)
    returns    (B, 3) = sum_j m_j*g/(r^3+e) * (d/r) * dt
    """
    d = pos_old[None, :, :] - pos_i_new[:, None, :]  # (B, N, 3) = b - a
    r2 = jnp.sum(d * d, axis=-1)  # (B, N)
    n = pos_old.shape[0]
    self_mask = idx_i[:, None] == jnp.arange(n)[None, :]
    # Guard only the diagonal (the reference skips only i == index).
    r2_safe = jnp.where(self_mask, 1.0, r2)
    r = jnp.sqrt(r2_safe)
    w = mass[None, :] * params.g / (r * r2_safe + params.e) / r
    w = jnp.where(self_mask, 0.0, w)
    return jnp.sum(w[:, :, None] * d, axis=1) * params.dt


def naive_forces_dense(pos_new, pos_old, mass, params: SimParams):
    """(N,3) accel*dt via one dense (N,N) evaluation."""
    idx = jnp.arange(pos_new.shape[0])
    return _pair_acc(pos_new, idx, pos_old, mass, params)


def naive_forces_ref(pos_new, pos_old, mass, params: SimParams, block: int = 2048):
    """(N,3) accel*dt evaluated in receiver row-blocks of size ``block``.

    N is padded up to a multiple of ``block``; padded receivers use index n
    (never matches a source) and their rows are discarded.
    """
    n = pos_new.shape[0]
    if n <= block:
        return naive_forces_dense(pos_new, pos_old, mass, params)
    pad = (-n) % block
    pos_pad = jnp.pad(pos_new, ((0, pad), (0, 0)))
    idx_pad = jnp.arange(n + pad)
    nb = (n + pad) // block
    pos_blocks = pos_pad.reshape(nb, block, 3)
    idx_blocks = idx_pad.reshape(nb, block)

    def one_block(args):
        pb, ib = args
        return _pair_acc(pb, ib, pos_old, mass, params)

    acc = lax.map(one_block, (pos_blocks, idx_blocks))
    return acc.reshape(nb * block, 3)[:n]
