"""Octet tables for a LET import forest — the fused multi-chip walk.

The split LET walk (rounds 2-4) ran the local tree through the fast
octet engine and the small import forest through a SECOND group walk
(skip engine), paying the group-walk machinery's fixed budgets — list
arrays, compaction sorts, iteration caps — twice; measured 0.33 s of a
~2.3 s projected step at n_local=4M on v5e (PERF.md "Measured LET
component pricing"), i.e. ~30% of a 4M-row local walk for ~2% of the
rows. This module makes the import forest octet-walkable so ONE
`group_tree_forces` call covers local tree + imports (the import roots
ride the per-lane stack as extra seeds) and the second walk's fixed
costs disappear. Reference contrast: the coarse-cell exchange is the
reference's own roadmap item (/root/reference/README.md:8); fusing its
traversal into the main walk has no reference analog (single GPU).

Design — identity mapping instead of the local build's BFS rank
(ops/tree_build.py octet assembly):

- Octet row r describes forest row r. No internal-node compaction, no
  BFS re-rank, no sorts: the table build is 8 narrow skip-chases plus 8
  payload row-gathers and elementwise packing, all sized by the
  COMPACTED forest (let_tree.compact_import_forest strips the P*R
  buffer slack to real rows, a few face-buffers at realistic geometry).
- The per-child octet pointer needs no `fc` column: the off columns
  store `child_row - parent_row` (for internal children), so the walk
  derives a child's octet row as `parent_octet_row + off[c]` — the off
  columns do double duty as payload-start offsets (member runs) and
  row offsets (descent). Header children store `child_row + 1 -
  parent_row` (their payload run starts past the header row); headers
  are terminal, so the pointer reading is never taken for them.
- Child geometry (digit + 9-bit quantized cog) is derived from the
  child's cog via the same full-depth Morton quantization the local
  build uses on its first particle. A cog is interior to its cell up
  to f32 rounding at a face; a boundary-rounded cog mis-cells by one
  but then quantizes to within half a quantization step of the true
  position, inside the sqrt(3)/1024 bound the walk's inflated
  acceptance test already covers.
- Every non-internal child (terminal cell, particle point, member-run
  header) carries the octet `term` bit; opened, it expands to its
  derived member run (`let_tree.derive_first_count_parts`): terminals
  and points are 1-member runs at their own cog/mass — identical to
  their accepted point-mass contribution — and headers expand to their
  payload particles. Junk rows a merged member run sweeps over (the
  header row between two runs) carry zero-mass parts, contributing
  exactly zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.ops import morton
from wgpu_n_body_tpu.ops.tree_build import NO_CHILD, WIDTH, TreeArrays


class ImportSet(NamedTuple):
    """Everything `group_tree_forces` needs to fuse an import forest
    into the octet walk.

    forest:   compacted skip-format forest (first ABSOLUTE into the
              caller's concatenated source table).
    octets:   (cap_forest, 17) int32, identity-mapped (row r = forest
              row r): cols 0-7 packed child geometry, 8-15 child
              payload/row offsets (see module docstring), 16 unused.
    pts:      (cap_forest*12, 8) int32 comb-table sections, slot-major
              like the local build's octet_pts: single rows at
              c*cap_forest + r for slot c, sibling-pair rows at
              (8 + c//2)*cap_forest + r.
    roots:    (P,) int32 compacted root row per import buffer.
    extents:  (P,) int32 rows per buffer; 0 = inert (self lane).
    part_base: static int — source-table index of compacted row 0.
    """

    forest: TreeArrays
    octets: jax.Array
    pts: jax.Array
    roots: jax.Array
    extents: jax.Array
    part_base: int


def build_import_octets(
    forest: TreeArrays,
    roots: jax.Array,
    extents: jax.Array,
    root_width: jax.Array,
    depth: int,
    part_base: int,
) -> ImportSet:
    """Pack per-child octet rows for every internal forest row.

    All import trees share the local tree's global Morton grid (the LET
    sort uses the pmax-global bound), so levels derive from widths:
    width = root_width * 2^-level exactly, hence level =
    round(log2(root_width) - log2(width)) is exact for every real cell.
    """
    cap = forest.nodes_f32.shape[0] - 1  # static (excl. sentinel row)
    nodes = forest.nodes_f32
    bound = root_width * 0.5

    w_par = nodes[:cap, WIDTH]
    is_int = (nodes[:cap, NO_CHILD] == 0.0) & (nodes[:cap, 3] > 0.0)
    lvl_par = jnp.where(
        is_int,
        jnp.clip(
            jnp.round(
                jnp.log2(root_width) - jnp.log2(jnp.maximum(w_par, 1e-30))
            ).astype(jnp.int32),
            0,
            depth,
        ),
        0,
    )
    first_par = forest.first[:cap]  # absolute (= part_base + row)

    # Sibling chase: the dependent hop reads only the 4-byte skip column
    # (the build's pattern — payload row gathers below are independent
    # and overlap). A child chain never crosses its parent's subtree
    # end, which the compaction clamped to the buffer extent.
    rr = jnp.arange(cap, dtype=jnp.int32)
    par_skip = forest.skip[:cap]
    u = jnp.minimum(rr + 1, cap)
    u_c, ex_c = [], []
    for c in range(8):
        ex = is_int & (u < par_skip)
        u_c.append(u)
        ex_c.append(ex)
        if c < 7:
            u = jnp.where(ex, jnp.minimum(jnp.take(forest.skip, u), cap), u)

    node_bits = lax.bitcast_convert_type(nodes, jnp.int32)
    far_bits = lax.bitcast_convert_type(jnp.float32(1e15), jnp.int32)
    lvl_c = jnp.clip(lvl_par + 1, 0, depth)
    sh = jnp.clip(depth - lvl_c, 0, 31).astype(jnp.uint32)
    w_c = w_par * 0.5
    geom_cols, off_cols, pts_rows = [], [], []
    for c in range(8):
        ex = ex_c[c]
        row = jnp.take(nodes, u_c[c], axis=0)  # (cap, 8) child node rows
        bits = jnp.take(node_bits, u_c[c], axis=0)
        first_u = jnp.take(forest.first, u_c[c])  # absolute payload start
        term_u = row[:, NO_CHILD] > 0.0
        cog = row[:, 0:3]
        cell = morton.quantize(cog, bound, depth)  # (cap, 3) uint32
        cell_l = (cell >> sh[:, None]).astype(jnp.float32)
        lo = cell_l * w_c[:, None] - bound
        q = jnp.clip(
            jnp.floor((cog - lo) / jnp.maximum(w_c, 1e-30)[:, None] * 512.0),
            0.0,
            511.0,
        ).astype(jnp.int32)
        digit = (
            ((cell[:, 0] >> sh) & 1)
            | (((cell[:, 1] >> sh) & 1) << 1)
            | (((cell[:, 2] >> sh) & 1) << 2)
        ).astype(jnp.int32)
        geom_cols.append(
            jnp.where(
                ex,
                (jnp.int32(1) << 31)
                | (term_u.astype(jnp.int32) << 30)
                | (digit << 27)
                | (q[:, 2] << 18)
                | (q[:, 1] << 9)
                | q[:, 0],
                0,
            )
        )
        off_cols.append(jnp.where(ex, first_u - first_par, 0))
        pts_rows.append(
            jnp.stack(
                [
                    jnp.where(ex, bits[:, 0], far_bits),
                    jnp.where(ex, bits[:, 1], 0),
                    jnp.where(ex, bits[:, 2], 0),
                    jnp.where(ex, bits[:, 3], 0),  # mass 0 for absent
                    jnp.full_like(rr, far_bits),
                    jnp.zeros_like(rr),
                    jnp.zeros_like(rr),
                    jnp.zeros_like(rr),
                ],
                axis=1,
            )
        )
    octets = jnp.stack(
        geom_cols + off_cols + [jnp.zeros((cap,), jnp.int32)], axis=1
    )  # (cap, 17)
    # pts sections SLOT-major (assembly = pure concatenation, the
    # build's layout lesson): singles then sibling pairs.
    sib_pairs = jnp.concatenate(
        [
            jnp.concatenate(
                [pts_rows[2 * p][:, 0:4], pts_rows[2 * p + 1][:, 0:4]],
                axis=1,
            )
            for p in range(4)
        ],
        axis=0,
    )  # (cap*4, 8)
    pts = jnp.concatenate(pts_rows + [sib_pairs], axis=0)  # (cap*12, 8)
    return ImportSet(
        forest=forest,
        octets=octets,
        pts=pts,
        roots=roots,
        extents=extents,
        part_base=part_base,
    )
