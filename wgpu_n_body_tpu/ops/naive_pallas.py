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

# Probe flag (VERDICT r4 stretch #8, fresh-process A/B only): replace the
# kernel's one true divide  w = x / (r^3 + e)  with a reciprocal built
# from the rsqrt unit plus one Newton refinement:
#     y0 = rsqrt(d)^2          (~1-2 ulp of 1/d)
#     y1 = y0 * (2 - d*y0)     (Newton: quadratic convergence)
# The kernel is VPU-transcendental-bound (~60% of slot peak, PERF.md) and
# divides occupy multiple rsqrt-class slots, so if the trade wins the
# whole step speeds up. NOT reference-exact (last-ulp differences vs the
# rounded divide) — measurement-only; production paths keep the divide.
_RECIP_NEWTON = False


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
        if _RECIP_NEWTON:  # probe: divide -> rsqrt^2 + one Newton step
            d = r2 * r + e
            y = jax.lax.rsqrt(d)
            y = y * y
            y = y * (2.0 - d * y)
            w = mgdt_ref[0:1, :] * inv_r * y
        else:
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


def _kernel_mxu(
    off_ref,
    pint_ref,
    pjt_ref,
    mgdt_ref,
    out_ref,
    acc_ref,
    *,
    e: float,
    tile_i: int,
    tile_j: int,
    num_j: int,
):
    """MXU-hybrid variant: sources in SUBLANES, receivers in LANES.

    The per-pair geometry (dx, r^2, w) is exact VPU arithmetic — identical
    formula and operand values to ``_kernel`` — but the per-pair
    multiply-accumulate (3 muls + 3 lane reductions there, ~40% of the VPU
    ops) moves to ONE MXU matmul per block:

        acc(4, TI) += [pjx; pjy; pjz; 1](4, TJ) @ W(TJ, TI)

    so rows of ``acc`` carry [sum w*pjx, sum w*pjy, sum w*pjz, sum w], and
    the force resolves once per receiver at the end of the j sweep:

        a_i = (sum_j w*p_old_j) - p_new_i * (sum_j w)      # = sum w*(pj-pi)

    This factoring changes only f32 accumulation order/association vs the
    per-pair ``w*(pj-pi)`` form (like any blocked sum); the worst case is a
    near pair, where the error is ~eps32 * |p| / r of that pair's term —
    measured end-to-end against the dense oracle in tests/test_naive.py.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    row_off = off_ref[0]

    pix = pint_ref[0:1, :]  # (1, TI) post-drift receiver positions
    piy = pint_ref[1:2, :]
    piz = pint_ref[2:3, :]
    pjx = pjt_ref[:, 0:1]  # (TJ, 1) pre-step source positions
    pjy = pjt_ref[:, 1:2]
    pjz = pjt_ref[:, 2:3]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def weights(masked: bool):
        dx = pjx - pix  # (TJ, TI)
        dy = pjy - piy
        dz = pjz - piz
        r2 = dx * dx + dy * dy + dz * dz
        if masked:
            rows = j * tile_j + jax.lax.broadcasted_iota(
                jnp.int32, (tile_j, tile_i), 0
            )
            cols = row_off + i * tile_i + jax.lax.broadcasted_iota(
                jnp.int32, (tile_j, tile_i), 1
            )
            self_mask = rows == cols
            r2s = jnp.where(self_mask, 1.0, r2)
        else:
            r2s = r2
        inv_r = jax.lax.rsqrt(r2s)
        r = r2 * inv_r
        w = mgdt_ref[:, 0:1] * inv_r / (r2 * r + e)
        if masked:
            w = jnp.where(self_mask, 0.0, w)
        return w

    def accumulate(masked: bool):
        w = weights(masked)
        # [pjx; pjy; pjz; 1] (4, TJ) — Mosaic pads the 4 sublanes to 8.
        ones = jnp.ones((1, tile_j), jnp.float32)
        p4 = jnp.concatenate([pjx.T, pjy.T, pjz.T, ones], axis=0)
        acc_ref[:] += jax.lax.dot(
            p4,
            w,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    r0 = row_off + i * tile_i
    diag = (j * tile_j < r0 + tile_i) & (r0 < (j + 1) * tile_j)

    @pl.when(diag)
    def _():
        accumulate(masked=True)

    @pl.when(jnp.logical_not(diag))
    def _():
        accumulate(masked=False)

    @pl.when(j == num_j - 1)
    def _():
        a = acc_ref[:]  # (4, TI)
        out_ref[:] = a[0:3, :] - a[3:4, :] * pint_ref[:]  # (3, TI)


# Default kernel variant when ``mxu=None``: False = the exact dx-form VPU
# kernel (reference-parity numerics). The MXU-hybrid is OPT-IN via
# NaiveParams.mxu / the ``mxu`` static arg — its factored accumulation is
# measurably less accurate (see NaiveParams docstring). NOTE: jit caches by
# static arg value, so flipping this module flag between two mxu=None calls
# in one process silently reuses the first trace — pass ``mxu`` explicitly
# when A/B-ing.
_USE_MXU = False


@functools.partial(
    jax.jit, static_argnames=("params", "tile_i", "tile_j", "interpret", "mxu")
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
    mxu: bool | None = None,
) -> jax.Array:
    """(N_recv, 3) acc*dt for the receivers.

    ``row_offset`` is the global particle index of receiver row 0 — pass
    the shard offset when receivers are a shard of the source array so the
    i==j self-mask lands on the true diagonal (sources are always indexed
    globally from 0).

    ``mxu`` selects the kernel variant (None = module default ``_USE_MXU``):
    False is the original all-VPU layout (receivers in sublanes), True the
    MXU-hybrid (receivers in lanes, matmul accumulation — see _kernel_mxu).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mxu is None:
        mxu = _USE_MXU
    n_recv = pos_new.shape[0]
    n_src = pos_old.shape[0]
    # Tiles are powers of two; shrink for tiny problems. Receivers live in
    # sublanes (VPU variant) or lanes (MXU variant); sources in the other.
    tile_i = min(tile_i, _round_up(n_recv, 128 if mxu else 8))
    tile_j = min(tile_j, _round_up(n_src, 8 if mxu else 128))
    ni = _round_up(n_recv, tile_i)
    nj = _round_up(n_src, tile_j)

    pos_new_p = jnp.pad(
        pos_new, ((0, ni - n_recv), (0, 0)), constant_values=_PAD_SENTINEL
    )
    pos_old_p = jnp.pad(
        pos_old, ((0, nj - n_src), (0, 0)), constant_values=_PAD_SENTINEL
    )
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    grid = (ni // tile_i, nj // tile_j)

    if mxu:
        mgdt = (mass * (params.g * params.dt))[:, None]  # (n_src, 1)
        mgdt = jnp.pad(mgdt, ((0, nj - n_src), (0, 0)))
        kernel = functools.partial(
            _kernel_mxu,
            e=params.e,
            tile_i=tile_i,
            tile_j=tile_j,
            num_j=grid[1],
        )
        acc_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (3, tile_i), lambda i, j: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_j, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_j, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (3, tile_i), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((3, ni), jnp.float32),
            scratch_shapes=[pltpu.VMEM((4, tile_i), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=20 * ni * nj,
                bytes_accessed=(ni // tile_i) * nj * 16 + ni * 24,
                transcendentals=2 * ni * nj,
            ),
            interpret=interpret,
        )(off, pos_new_p.T, pos_old_p, mgdt)
        return acc_t.T[:n_recv]

    pos_old_t = pos_old_p.T  # (3, Nj)
    mgdt = (mass * (params.g * params.dt))[None, :]  # (1, n_src)
    mgdt = jnp.pad(mgdt, ((0, 0), (0, nj - n_src)))

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
