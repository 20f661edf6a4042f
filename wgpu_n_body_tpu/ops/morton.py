"""Morton (Z-order) keys for device-side octree construction.

The reference builds its octree by BFS subdivision on the host
(src/sims/tree.rs:458-544) with child index
``(x>cx) | (y>cy)<<1 | (z>cz)<<2`` (tree.rs:549-553). That bit order makes
the reference's child ordering exactly Morton order with x as the lowest
interleaved bit — so sorting particles by Morton key reproduces the
reference's tree-DFS particle reorder (tree.rs:564-602) without any
recursion, and octree cells at depth L are simply runs of equal
3L-bit key prefixes in the sorted order.

Keys are 3*D bits (D = max depth), stored as an (hi, lo) pair of uint32
(hi = top 3*min(D,10) bits) so D up to 20 works without 64-bit lanes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _spread_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Insert two zero bits between each of the low 10 bits (uint32)."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def quantize(pos: jnp.ndarray, bound: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Map positions in [-bound, bound]^3 to integer cells in [0, 2^depth).

    The root cube is centered at the origin with half-width ``bound``
    (reference tree.rs:457-471: root center [0,0,0], width = 2*bound).
    """
    cells = (pos + bound) * ((2.0**depth) / (2.0 * bound))
    cells = jnp.clip(cells, 0.0, 2.0**depth - 1.0)
    return cells.astype(jnp.uint32)


def morton_keys(cell: jnp.ndarray, depth: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(hi, lo) uint32 Morton keys for (N, 3) integer cells at ``depth``.

    Bit layout per level (most-significant first): z y x — matching
    decide_octant's ``x | y<<1 | z<<2`` (tree.rs:549-553).
    """
    if depth > 20:
        raise ValueError("max supported depth is 20 (60-bit keys)")
    d_hi = min(depth, 10)
    d_lo = depth - d_hi
    x, y, z = cell[:, 0], cell[:, 1], cell[:, 2]
    xh, yh, zh = (v >> d_lo for v in (x, y, z))
    hi = _spread_bits_10(xh) | (_spread_bits_10(yh) << 1) | (_spread_bits_10(zh) << 2)
    if d_lo == 0:
        lo = jnp.zeros_like(hi)
    else:
        mask = jnp.uint32((1 << d_lo) - 1)
        xl, yl, zl = (v & mask for v in (x, y, z))
        lo = (
            _spread_bits_10(xl)
            | (_spread_bits_10(yl) << 1)
            | (_spread_bits_10(zl) << 2)
        )
    return hi, lo


def split_levels(
    hi: jnp.ndarray, lo: jnp.ndarray, depth: int
) -> jnp.ndarray:
    """(n,) int32: the shallowest level at which key[i] differs from
    key[i-1] — i.e. particle i starts a new cell run at exactly the
    levels >= split_levels[i]. Element 0 is 0 (a run start everywhere);
    identical adjacent keys give depth+1 (never a start). One clz pass
    replaces per-level prefix comparisons (prefixes nest, so run starts
    are monotone in level)."""
    import jax

    d_hi = min(depth, 10)
    xh = (hi[1:] ^ hi[:-1]).astype(jnp.int32)
    xl = (lo[1:] ^ lo[:-1]).astype(jnp.int32)
    # highest differing bit -> first differing level:
    # hi holds levels 1..d_hi in its low 3*d_hi bits (level L at bits
    # [3*(d_hi-L)+2 : 3*(d_hi-L)]), lo holds levels d_hi+1..depth.
    bh = 31 - jax.lax.clz(xh)
    bl = 31 - jax.lax.clz(xl)
    lvl = jnp.where(
        xh != 0,
        d_hi - bh // 3,
        jnp.where(xl != 0, depth - bl // 3, depth + 1),
    ).astype(jnp.int32)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), lvl])


def prefix_at_level(
    hi: jnp.ndarray, lo: jnp.ndarray, level: int, depth: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Truncate 3*depth-bit keys to their first 3*level bits (node id at level)."""
    d_hi = min(depth, 10)
    d_lo = depth - d_hi
    if level <= d_hi:
        return hi >> jnp.uint32(3 * (d_hi - level)), jnp.zeros_like(lo)
    return hi, lo >> jnp.uint32(3 * (d_lo - (level - d_hi)))
