"""Blocked parallel scans tuned for TPU.

``jax.lax.associative_scan`` materializes full-array concats per doubling
step; for the octree build's per-level segmented scans that was ~80% of
the build time (measured r1: 549 ms at N=1M, 17 levels). These scans do
two-level blocking (within fixed blocks, then across block totals) with
plain pad+slice shifts — a handful of fused elementwise passes.

``ff_cumsum_ext`` is a float-float (double-single) prefix sum: the build
derives per-node mass/cog totals by DIFFERENCING the global prefix sum at
run boundaries, which in plain f32 would carry eps*total into small nodes
(~1e-1 absolute at N=1M with the disc's 150000 central mass). Two-float
compensated accumulation keeps the boundary difference accurate to
~|total|*2^-48, far below f32 ulp of any node total.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_last(x: jax.Array, k: int, fill) -> jax.Array:
    """x shifted right by k along the last axis, prefilled with ``fill``."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x, pad, constant_values=fill)[..., : x.shape[-1]]


def _scan_last(x, op, fill, block: int):
    """Inclusive scan of a pytree of same-shaped arrays along the last
    axis. ``op(a, b)`` combines two pytrees (b = earlier elements shifted
    in); ``fill`` gives the identity per leaf."""
    leaves, treedef = jax.tree_util.tree_flatten(x)
    fills = jax.tree_util.tree_leaves(fill)
    n = leaves[0].shape[-1]
    nb = -(-n // block)
    padded = [
        jnp.pad(
            leaf,
            [(0, 0)] * (leaf.ndim - 1) + [(0, nb * block - n)],
            constant_values=f,
        ).reshape(leaf.shape[:-1] + (nb, block))
        for leaf, f in zip(leaves, fills)
    ]
    y = jax.tree_util.tree_unflatten(treedef, padded)

    def shift(t, k):
        return jax.tree_util.tree_unflatten(
            treedef,
            [
                _shift_last(leaf, k, f)
                for leaf, f in zip(jax.tree_util.tree_leaves(t), fills)
            ],
        )

    k = 1
    while k < block:
        y = op(y, shift(y, k))
        k *= 2
    # scan the per-block totals (last element of each block)
    tot = jax.tree_util.tree_map(lambda leaf: leaf[..., -1], y)
    k = 1
    while k < nb:
        tot = op(tot, shift(tot, k))
        k *= 2
    off = shift(tot, 1)  # exclusive block offsets
    off = jax.tree_util.tree_map(lambda leaf: leaf[..., None], off)
    y = op(y, off)
    y = jax.tree_util.tree_map(
        lambda leaf: leaf.reshape(leaf.shape[:-2] + (nb * block,))[..., :n], y
    )
    return y


def cummax_last(x: jax.Array, block: int = 512) -> jax.Array:
    """Inclusive cumulative max along the last axis (int32)."""
    lo = jnp.iinfo(x.dtype).min
    return _scan_last(x, lambda a, b: jnp.maximum(a, b), lo, block)


def cummin_last(x: jax.Array, block: int = 512) -> jax.Array:
    """Inclusive cumulative min along the last axis (int32)."""
    hi = jnp.iinfo(x.dtype).max
    return _scan_last(x, lambda a, b: jnp.minimum(a, b), hi, block)


def _ff_add(a, b):
    """Compensated (TwoSum + renorm) addition of float-float pairs."""
    ahi, alo = a
    bhi, blo = b
    s = ahi + bhi
    t = s - ahi
    err = (ahi - (s - t)) + (bhi - t)
    lo = alo + blo + err
    hi2 = s + lo
    lo2 = lo - (hi2 - s)
    return hi2, lo2


def ff_cumsum_ext(x: jax.Array, block: int = 512):
    """Float-float prefix sums of ``x`` (n, c) along axis 0.

    Returns (hi, lo), each (n+1, c): row j holds sum(x[:j]) — row 0 is
    zero, row n the grand total — so a contiguous range [a, b) sums to
    ``(hi[b] - hi[a]) + (lo[b] - lo[a])`` with ~2^-48 relative error.
    """
    n, c = x.shape
    xt = x.T  # scan along the last axis
    hi, lo = _scan_last(
        (xt, jnp.zeros_like(xt)), _ff_add, (jnp.float32(0), jnp.float32(0)),
        block,
    )
    zero = jnp.zeros((1, c), x.dtype)
    return (
        jnp.concatenate([zero, hi.T], axis=0),
        jnp.concatenate([zero, lo.T], axis=0),
    )
