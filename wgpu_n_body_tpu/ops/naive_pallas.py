"""Pallas TPU kernel: VMEM-tiled all-pairs softened gravity.

This is the TPU-native replacement for naive.wgsl (one GPU thread per
particle, O(N) inner loop). Instead of a thread-per-body scalar loop, the
force is evaluated as a 2-D grid of (receiver-tile x source-tile) blocks:

  grid = (Np/TI, Np/TJ)          # j (sources) is the minor, streaming axis
  receivers  i: pos_new block (TI, 3)  — stays resident across the j sweep
  sources    j: pos_old^T block (3, TJ), m*g*dt block (1, TJ) — streamed
  output acc_i: (TI, 3) block, accumulated over all j iterations (the
  Pallas analog of the WGSL accumulator register, naive.wgsl:24,41)

Per (i, j) block, all TI*TJ pair interactions are evaluated as dense VPU
arithmetic on (TI, TJ) tiles — receivers in sublanes, sources in lanes —
with the exact reference formula (naive.wgsl:38-41):

    w  = m_j * g * dt / (r^3 + e) / r        (dt inside, as upstream)
    a += w * (p_old_j - p_new_i)

Self-interaction (global i == global j) is masked to zero, matching the
``i == index`` skip at naive.wgsl:30-32. Distinct coincident particles
produce the same NaN as WGSL's normalize(0) — not rescued.

Padding: N is rounded up to the tile lcm; padded slots get position
sentinel 1e15 and zero mass, which makes their weights exactly 0 for every
real receiver (mgdt = 0 and r^3 overflows to +inf, so w = 0 * finite / inf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgpu_n_body_tpu.params import SimParams

_PAD_SENTINEL = 1e15


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    off_ref, pin_ref, pjt_ref, mgdt_ref, out_ref, *, e: float, tile_i: int, tile_j: int
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row_off = off_ref[0]  # global index of the first receiver (sharded use)

    pi = pin_ref[:]  # (TI, 3) post-drift receiver positions
    pix = pi[:, 0:1]  # (TI, 1)
    piy = pi[:, 1:2]
    piz = pi[:, 2:3]
    pjx = pjt_ref[0:1, :]  # (1, TJ) pre-step source positions
    pjy = pjt_ref[1:2, :]
    pjz = pjt_ref[2:3, :]

    def accumulate(masked: bool):
        # d = b - a (direction toward the source), naive.wgsl:39
        dx = pjx - pix  # (TI, TJ)
        dy = pjy - piy
        dz = pjz - piz
        r2 = dx * dx + dy * dy + dz * dz

        if masked:
            rows = row_off + i * tile_i + jax.lax.broadcasted_iota(
                jnp.int32, (tile_i, tile_j), 0
            )
            cols = j * tile_j + jax.lax.broadcasted_iota(
                jnp.int32, (tile_i, tile_j), 1
            )
            self_mask = rows == cols
            r2s = jnp.where(self_mask, 1.0, r2)
        else:
            r2s = r2
        inv_r = jax.lax.rsqrt(r2s)
        r = r2 * inv_r  # = sqrt(r2)
        w = mgdt_ref[0:1, :] * inv_r / (r2 * r + e)
        if masked:
            w = jnp.where(self_mask, 0.0, w)

        ax = jnp.sum(w * dx, axis=1, keepdims=True)  # (TI, 1)
        ay = jnp.sum(w * dy, axis=1, keepdims=True)
        az = jnp.sum(w * dz, axis=1, keepdims=True)
        out_ref[:] += jnp.concatenate([ax, ay, az], axis=1)  # (TI, 3)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # The i==index self-skip (naive.wgsl:30-32) only has work to do on
    # blocks whose receiver rows intersect their source columns; every
    # other block runs the unmasked body (~5 fewer VPU ops of ~23 per
    # pair: two iotas, a compare, two selects). Receivers are rows
    # [row_off + i*TI, +TI) of the global source index space.
    r0 = row_off + i * tile_i
    diag = (r0 < (j + 1) * tile_j) & (j * tile_j < r0 + tile_i)

    @pl.when(diag)
    def _():
        accumulate(masked=True)

    @pl.when(jnp.logical_not(diag))
    def _():
        accumulate(masked=False)


@functools.partial(
    jax.jit, static_argnames=("params", "tile_i", "tile_j", "interpret")
)
def naive_forces_pallas(
    pos_new: jax.Array,
    pos_old: jax.Array,
    mass: jax.Array,
    params: SimParams,
    tile_i: int = 256,
    tile_j: int = 1024,
    interpret: bool | None = None,
    row_offset: jax.Array | int = 0,
) -> jax.Array:
    """(N_recv, 3) acc*dt for the receivers.

    ``row_offset`` is the global particle index of receiver row 0 — pass
    the shard offset when receivers are a shard of the source array so the
    i==j self-mask lands on the true diagonal (sources are always indexed
    globally from 0).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_recv = pos_new.shape[0]
    n_src = pos_old.shape[0]
    # Tiles are powers of two; shrink for tiny problems.
    tile_i = min(tile_i, _round_up(n_recv, 8))
    tile_j = min(tile_j, _round_up(n_src, 128))
    ni = _round_up(n_recv, tile_i)
    nj = _round_up(n_src, tile_j)

    pos_new_p = jnp.pad(
        pos_new, ((0, ni - n_recv), (0, 0)), constant_values=_PAD_SENTINEL
    )
    pos_old_t = jnp.pad(
        pos_old, ((0, nj - n_src), (0, 0)), constant_values=_PAD_SENTINEL
    ).T  # (3, Nj)
    mgdt = (mass * (params.g * params.dt))[None, :]  # (1, n_src)
    mgdt = jnp.pad(mgdt, ((0, 0), (0, nj - n_src)))
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)

    grid = (ni // tile_i, nj // tile_j)
    kernel = functools.partial(
        _kernel, e=params.e, tile_i=tile_i, tile_j=tile_j
    )
    acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ni, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=15 * ni * nj,
            bytes_accessed=(ni // tile_i) * nj * 16 + ni * 24,
            transcendentals=2 * ni * nj,
        ),
        interpret=interpret,
    )(off, pos_new_p, pos_old_t, mgdt)
    return acc[:n_recv]
