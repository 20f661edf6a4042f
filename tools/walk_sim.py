"""Host-side step-count simulator for the octet phase-A walk.

Replicates ops/tree_walk_group.phase_a_octet's per-lane scheduling at the
SEMANTIC level (visits, candidate selection, member drains, pushes/pops)
on a real tree built on the CPU backend, and reports where the lockstep
steps go:

  first_visit   an open item entered with an empty processed mask — the
                one unavoidable gather per opened node
  revisit       an open item re-entered with a nonempty mask (after a
                pop, or a stay after a fully-drained member run) — these
                re-gather a row the walk has already seen
  member        a dedicated member-lane streaming step
  idle_pop      a visit that finds no candidates and only pops

plus per-block lockstep sums (cost model of the real kernel: a block's
step count is the max over its density-ordered lanes). The "cached"
counterfactual models a stack that carries the parent's remaining
candidate queue, so pops install the next candidate directly and
revisit/idle_pop steps disappear (member streaming and first visits are
unchanged).

Usage: python tools/walk_sim.py --n 131072 --theta 0.5 --init disc
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument("--init", default="disc", choices=["disc", "uniform"])
    ap.add_argument("--bucket", type=int, default=16)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--k-slots", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from wgpu_n_body_tpu import inits
    from wgpu_n_body_tpu.ops.tree_build import NO_CHILD, WIDTH, build_tree, morton_sort
    from wgpu_n_body_tpu.ops.tree_walk_group import _tile_assignment
    from wgpu_n_body_tpu.params import SimParams, TreeParams

    params = SimParams(
        particle_num=args.n, g=1e-5 if args.init == "disc" else 1e-6
    )
    tp = TreeParams(theta=args.theta, leaf_bucket=args.bucket,
                    walk_tile=args.tile, walk_block=args.block)
    init_fn = {"disc": inits.disc_init, "uniform": inits.uniform_init}[args.init]
    state = init_fn(jax.random.key(0), params)
    state_s, bound, keys = morton_sort(state, tp.max_depth)
    tree = build_tree(state_s, keys, bound, tp)

    n, g, depth, theta = args.n, args.tile, tp.max_depth, args.theta
    tile_id, lstar, t_cap, t_blk, ta_blk = _tile_assignment(
        keys, n, depth, g, args.block
    )
    tile_id = np.asarray(jnp_min(tile_id, t_cap - 1))
    pos = np.asarray(state_s.pos)
    lstar = np.asarray(lstar)

    # per-tile bboxes + density order (mirrors group_tree_forces)
    piece_start = np.searchsorted(tile_id, np.arange(t_cap)).astype(np.int64)
    piece_end = np.concatenate([piece_start[1:], [n]])
    piece_len = piece_end - piece_start
    blo = np.full((t_cap, 3), np.inf)
    bhi = np.full((t_cap, 3), -np.inf)
    for t in range(t_cap):
        if piece_len[t] > 0:
            seg = pos[piece_start[t] : piece_end[t]]
            blo[t] = seg.min(axis=0)
            bhi[t] = seg.max(axis=0)
    lstar_tile = np.where(
        piece_len > 0, lstar[np.minimum(piece_start, n - 1)], -1
    )
    tt = np.arange(t_cap)
    order = np.argsort(-(lstar_tile * t_cap) - (t_cap - tt), kind="stable")

    octets = np.asarray(tree.octets)
    first = np.asarray(tree.first)
    count = np.asarray(tree.count)
    nodes = np.asarray(tree.nodes_f32)
    root_w = float(nodes[0, WIDTH])
    root_term = float(nodes[0, NO_CHILD]) > 0.0
    accf = 1.0 + 0.002 * theta
    k_slots = args.k_slots

    cand_hist = np.zeros(9, np.int64)  # n_cand at first visits

    def walk_tile(t, mode="base", init_mask=0):
        """Returns (steps, first_visits, revisits, member_steps, idle_pops).

        One tuple entry per lockstep step the kernel would spend on this
        lane, classified by what the step does. Modes:

        base     the shipping kernel: at most one push per step (the
                 parent, carrying a processed-children mask); every
                 additional candidate costs a parent revisit.
        cache2   candidate-caching: each open step extracts candidates
                 #1 AND #2; a fully-drained member candidate installs #2
                 in the same step (no stay revisit), a descend pushes #2
                 directly (plus an old-style parent entry only when >= 3
                 candidates remain, i.e. up to TWO pushes per step), so
                 a node with k candidates costs max(k-2, 0) revisits
                 instead of k-1.
        cache2s  single-push variant: like cache2 but only when exactly
                 2 candidates remain (push #2 INSTEAD of the parent);
                 k > 2 keeps the base behavior. No stack-depth growth.
        """
        cache2 = mode in ("cache2", "dual")
        cache2s = mode == "cache2s"
        lo, hi = blo[t], bhi[t]

        def dmin_to(px, py, pz):
            dx = max(lo[0] - px, px - hi[0], 0.0)
            dy = max(lo[1] - py, py - hi[1], 0.0)
            dz = max(lo[2] - pz, pz - hi[2], 0.0)
            return (dx * dx + dy * dy + dz * dz) ** 0.5

        c_first, c_rev, c_mem, c_idle, max_sp = 0, 0, 0, 0, 0
        # root classification (free: happens outside the loop)
        r = nodes[0]
        if r[WIDTH] < theta * dmin_to(r[0], r[1], r[2]):
            return (0, 0, 0, 0, 0, 0)
        if root_term:
            item = ("mem", int(first[0]), int(count[0]))
        else:
            item = ("open", 0, int(first[0]), int(count[0]), init_mask,
                    root_w, 0.0, 0.0, 0.0)
        stack = []
        steps = 0
        while True:
            steps += 1
            max_sp = max(max_sp, len(stack))
            if item[0] == "mem":
                c_mem += 1
                _, a, b = item
                cm = min(b, 2 * k_slots - (a & 1))
                if b > cm:
                    item = ("mem", a + cm, b - cm)
                    continue
                if stack:
                    item = stack.pop()
                    continue
                break
            _, ptr, ib, ic, im, iw, ix, iy, iz = item
            if im == 0:
                c_first += 1
            else:
                c_rev += 1
            cw, hq = iw * 0.5, iw * 0.25
            cell_q = cw / 512.0
            row = octets[ptr]
            ex = [int(row[c]) < 0 for c in range(8)]  # bit 31 set
            off = [int(row[8 + c]) for c in range(8)]
            fc = int(row[16])
            off_next = [0] * 8
            off_next[7] = ic
            for c in range(6, -1, -1):
                off_next[c] = off[c + 1] if ex[c + 1] else ic
            acc_c, term_c, open_c, mem_c = [], [], [], []
            geom = []
            for c in range(8):
                c0 = int(row[c])
                term = ((c0 >> 30) & 1) == 1
                digit = (c0 >> 27) & 7
                qx, qy, qz = c0 & 511, (c0 >> 9) & 511, (c0 >> 18) & 511
                cx = ix + hq if (digit & 1) else ix - hq
                cy = iy + hq if (digit & 2) else iy - hq
                cz = iz + hq if (digit & 4) else iz - hq
                gx = (cx - hq) + (qx + 0.5) * cell_q
                gy = (cy - hq) + (qy + 0.5) * cell_q
                gz = (cz - hq) + (qz + 0.5) * cell_q
                a = ex[c] and (cw * accf < theta * dmin_to(gx, gy, gz))
                procd = ((im >> c) & 1) == 1
                acc_c.append(a)
                term_c.append(term)
                open_c.append(ex[c] and not a and not term and not procd)
                mem_c.append(ex[c] and not a and term and not procd)
                geom.append((cx, cy, cz))
            # emission units (sibling pairs share a unit)
            emit = [acc_c[c] and ((im >> c) & 1) == 0 for c in range(8)]
            units = 0
            for p in range(4):
                if emit[2 * p] or emit[2 * p + 1]:
                    units += 1
            n_emit = min(units, k_slots)
            # member runs (maximal adjacent runs)
            run_start = [
                mem_c[c] and (c == 0 or not mem_c[c - 1]) for c in range(8)
            ]
            # candidate slots (open children + member-run starts), in order
            cands = []
            done_bits = 0
            for c in range(8):
                if not ex[c] or emit[c]:
                    done_bits |= 1 << c
                if open_c[c] or (mem_c[c] and run_start[c]):
                    cands.append(c)
            n_cand = len(cands)
            if im == 0:
                cand_hist[min(n_cand, 8)] += 1
            new_mask = im | done_bits

            def run_of(c):
                """(bits, abs_start, length) of the member run starting at c."""
                e = c
                bits = 0
                while e < 8 and mem_c[e]:
                    bits |= 1 << e
                    e += 1
                a0 = ib + off[c]
                return bits, a0, (off_next[e - 1]) - off[c]

            def item_of(c):
                """(bits, item) for candidate c, as a pop would install it."""
                if open_c[c]:
                    # BFS-ranked table: child row = fc + #(internal < c)
                    ptr_c = fc + sum(
                        1 for k in range(c) if ex[k] and not term_c[k]
                    )
                    return 1 << c, (
                        "open", ptr_c, ib + off[c],
                        off_next[c] - off[c], 0, cw, *geom[c],
                    )
                bits, a0, blen = run_of(c)
                return bits, ("mem", a0, blen)

            if n_cand == 0:
                if im != 0:
                    c_idle += 1  # pure pop step (already counted in c_rev)
                if stack:
                    item = stack.pop()
                    continue
                break
            def do_push(bits):
                """Stack pushes for a descend into candidate #1."""
                if n_cand == 1:
                    return
                if cache2 or (cache2s and n_cand == 2):
                    bits2, item2 = item_of(cands[1])
                    if n_cand > 2:  # only reachable in full cache2
                        stack.append(("open", ptr, ib, ic,
                                      new_mask | bits | bits2, iw, ix, iy, iz))
                    stack.append(item2)
                else:
                    stack.append(("open", ptr, ib, ic, new_mask | bits,
                                  iw, ix, iy, iz))

            cand = cands[0]
            if open_c[cand]:
                bits = 1 << cand
                child = item_of(cand)[1]
                do_push(bits)
                item = child
                continue
            # member run candidate
            bits, a0, blen = run_of(cand)
            drain_cap = max(2 * (k_slots - n_emit) - (a0 & 1), 0)
            drained = min(drain_cap, blen)
            if drained > 0 and drained >= blen:
                # fully drained
                if (cache2 or cache2s) and n_cand == 1:
                    if stack:
                        item = stack.pop()
                        continue
                    break
                if cache2 or (cache2s and n_cand == 2):
                    bits2, item2 = item_of(cands[1])
                    if n_cand > 2:  # only reachable in full cache2
                        stack.append(("open", ptr, ib, ic,
                                      new_mask | bits | bits2, iw, ix, iy, iz))
                    item = item2
                    continue
                # stay on this node (a revisit step follows)
                item = ("open", ptr, ib, ic, new_mask | bits, iw, ix, iy, iz)
                continue
            do_push(bits)
            item = ("mem", a0 + drained, blen - drained)
        return (steps, c_first, c_rev, c_mem, c_idle, max_sp)

    def dual_masks(t):
        """Partition the root's candidates into two complementary
        pre-processed masks (greedy by subtree/run size, descending) for
        the dual-wavefront walk: each tile runs TWO lockstep contexts
        over one shared bbox, context i starting at the root with the
        other context's candidates (and, for context 1, the root's
        accepted children — emitted once, by context 0) pre-masked.
        Returns None when there is nothing to split (root accepted,
        terminal, or < 2 candidates)."""
        lo, hi = blo[t], bhi[t]

        def dmin_to(px, py, pz):
            dx = max(lo[0] - px, px - hi[0], 0.0)
            dy = max(lo[1] - py, py - hi[1], 0.0)
            dz = max(lo[2] - pz, pz - hi[2], 0.0)
            return (dx * dx + dy * dy + dz * dz) ** 0.5

        r = nodes[0]
        if root_term or r[WIDTH] < theta * dmin_to(r[0], r[1], r[2]):
            return None
        iw = root_w
        cw, hq = iw * 0.5, iw * 0.25
        cell_q = cw / 512.0
        row = octets[0]
        ic = int(count[0])
        ex = [int(row[c]) < 0 for c in range(8)]
        off = [int(row[8 + c]) for c in range(8)]
        off_next = [0] * 8
        off_next[7] = ic
        for c in range(6, -1, -1):
            off_next[c] = off[c + 1] if ex[c + 1] else ic
        acc_c, open_c, mem_c, dmin_c = [], [], [], []
        for c in range(8):
            c0 = int(row[c])
            term = ((c0 >> 30) & 1) == 1
            digit = (c0 >> 27) & 7
            qx, qy, qz = c0 & 511, (c0 >> 9) & 511, (c0 >> 18) & 511
            cx = hq if (digit & 1) else -hq
            cy = hq if (digit & 2) else -hq
            cz = hq if (digit & 4) else -hq
            gx = (cx - hq) + (qx + 0.5) * cell_q
            gy = (cy - hq) + (qy + 0.5) * cell_q
            gz = (cz - hq) + (qz + 0.5) * cell_q
            dm = dmin_to(gx, gy, gz)
            a = ex[c] and (cw * accf < theta * dm)
            acc_c.append(a)
            open_c.append(ex[c] and not a and not term)
            mem_c.append(ex[c] and not a and term)
            dmin_c.append(dm)

        def weight_of(c, size):
            if os.environ.get("DUAL_WEIGHT", "count") == "prox":
                return size / (1.0 + dmin_c[c] / max(cw, 1e-30)) ** 3
            return size

        accepted_bits = sum(1 << c for c in range(8) if acc_c[c])
        cands = []  # (weight, bits)
        for c in range(8):
            if open_c[c]:
                cands.append((weight_of(c, off_next[c] - off[c]), 1 << c))
            elif mem_c[c] and (c == 0 or not mem_c[c - 1]):
                e = c
                bits = 0
                while e < 8 and mem_c[e]:
                    bits |= 1 << e
                    e += 1
                cands.append((weight_of(c, off_next[e - 1] - off[c]), bits))
        if len(cands) < 2:
            return None
        w = [0, 0]
        bits2 = [0, 0]
        seq = (
            sorted(cands, reverse=True)
            if os.environ.get("DUAL_ORDER", "sorted") == "sorted"
            else cands
        )
        for weight, bits in seq:
            i = 0 if w[0] <= w[1] else 1
            w[i] += weight
            bits2[i] |= bits
        return bits2[1], bits2[0] | accepted_bits

    modes = ["base", "cache2s", "cache2", "dual"]
    per_mode = {}
    hist = None
    for m in modes:
        pt = np.zeros((t_cap, 6), np.int64)
        cand_hist[:] = 0
        for t in range(t_cap):
            if piece_len[t] > 0:
                if m == "dual":
                    dm = dual_masks(t)
                    if dm is None:
                        pt[t] = walk_tile(t, mode="cache2")
                    else:
                        r0 = walk_tile(t, mode="dual", init_mask=dm[0])
                        r1 = walk_tile(t, mode="dual", init_mask=dm[1])
                        pt[t] = [max(r0[0], r1[0])] + [
                            a + b for a, b in zip(r0[1:5], r1[1:5])
                        ] + [max(r0[5], r1[5])]
                else:
                    pt[t] = walk_tile(t, mode=m)
        per_mode[m] = pt
        if m == "base":
            hist = cand_hist.copy()

    blocks = max(1, t_cap // ta_blk)

    def lockstep(v):
        return int(
            sum(
                v[b * ta_blk : (b + 1) * ta_blk].max(initial=0)
                for b in range(blocks)
            )
        )

    tot = per_mode["base"].sum(axis=0)
    out = {
        "n": n, "theta": theta, "init": args.init,
        "tiles": int((piece_len > 0).sum()),
        "steps_total": int(tot[0]),
        "first_visits": int(tot[1]),
        "revisits": int(tot[2]),
        "member_steps": int(tot[3]),
        "idle_pops": int(tot[4]),
        "revisit_frac": round(float(tot[2] / max(tot[0], 1)), 4),
        "ncand_hist_first_visits": hist.tolist(),
    }
    for m in modes:
        pt = per_mode[m]
        out[f"lockstep_{m}"] = lockstep(pt[order, 0])
        out[f"max_stack_{m}"] = int(pt[:, 5].max())
        if m != "base":
            out[f"steps_total_{m}"] = int(pt[:, 0].sum())
            out[f"revisits_{m}"] = int(pt[:, 2].sum())
    print(json.dumps(out))


def jnp_min(x, v):
    import jax.numpy as jnp

    return jnp.minimum(x, v)


if __name__ == "__main__":
    main()
